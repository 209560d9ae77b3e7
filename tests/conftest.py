"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
unit-testable without a pod (the SURVEY.md §4 "fake backend" strategy:
``shard_map`` over a mocked ``jax.sharding.Mesh`` of host devices). The env
vars must be set before jax initializes, hence this conftest sets them at
import time.
"""

import os

# Force CPU even if the environment points at a TPU (JAX_PLATFORMS=axon):
# unit tests need deterministic f32 numerics and 8 virtual devices.
# NOTE: the axon sitecustomize imports jax at interpreter startup, so env
# vars alone are too late — also override via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; jax backend was initialized before conftest"
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


_RNG_SEED = 1234  # seed-pinned fixtures like the reference's conftest.py:7-12

# Modules whose tests dominate suite wall time (subprocess example CLIs,
# full SLAM pipeline runs, 8-device SPMD compiles). They are auto-marked
# ``slow`` so the fast gate (``pytest -m "not slow"``; ~15 min solo on
# the 1-core CI box, minutes on a workstation) actually gets run — a
# perf gate nobody waits for stops being run. The reference keeps its
# gate fast the same way (seed-pinned fixture, conftest.py:7-12 of
# kornia-py "so the perf gate doesn't flap").
_SLOW_MODULES = {
    "test_examples",
    "test_slam",
    "test_ba_dist",
    "test_parallel2",
    "test_models",
}

# Individually compile-heavy tests (measured >45 s each on this CPU);
# the capabilities they pin are also covered by faster siblings in the
# same modules, so the fast gate keeps breadth while staying runnable.
_SLOW_TESTS = {
    "test_paths_bit_identical",
    "test_match_quality_under_rotation",
    "test_fixed_shapes",
    "test_twoview_with_5pt_solver",
    "test_exact_cases",
    "test_rotation_u8",
    "test_orb_quadtree_spread_and_quality",
    # warp_shear approximations are superseded by the exact warp_pallas
    # default; keep test_matches_numpy + test_method_kwarg fast, push
    # the 1-4 min/case accuracy sweeps to the slow tier
    "test_rotations",
    "test_scales",
    "test_general_and_reflection",
    "test_u8_rgb",
    "test_warp_affine_exact_modes",
    "test_shear_f32",
}


# Compile-heavy parity tests (>10 s single-core, measured 2026-08-19 on
# the 1-core CI box) whose capability is also covered by a faster
# sibling in the same module. They stay in the pre-merge gate
# (``-m "not slow"``, ~16 min single-core) but are excluded from the
# smoke gate (``-m "not slow and not heavy"``, target <5 min) so the
# gate that gets run on every edit stays runnable.
_HEAVY_TESTS = {
    # geometry: RANSAC/refine sweeps (fast siblings: test_epnp_noiseless,
    # TestEpipolar basics, TestTwoView::test_bootstrap_simple)
    "test_bootstrap_with_outliers",
    "test_planar_scene_picks_homography",
    "test_pnp_ransac_with_outliers",
    "test_pnp_refine_improves",
    "test_ap3p_in_ransac",
    "test_ap3p_exact_recovery",
    "test_ransac_variants",
    "test_twoview_refine_improves",
    "test_batched_8pt",
    "test_minimal_exact",
    "test_batched_shapes",
    # warp_pallas: exact-kernel accuracy sweeps (fast sibling:
    # test_warp_affine_exact_identity / small-case checks)
    "test_remap_exact_bilinear",
    "test_warp_affine_exact_rotations",
    "test_warp_perspective_exact",
    "test_warp_affine_exact_general",
    "test_remap_fallback_on_torn_map",
    # optim: large-problem solver cross-checks (fast siblings:
    # test_schur_reduces_cost..., TestSegmentEngine::test_engine_pcg)
    "test_schur_pcg_matches_dense_and_scales",
    "test_depth_improves_structure",
    "test_depth_jacobian_matches_numeric",
    "test_engine_matches_fallback",
    "test_residual_zero_at_gt",
    # features/bow/flow e2e (fast siblings cover the primitives)
    "test_orb_frames",
    "test_matches_gather",
    "test_window_primitives_match",
    "test_trained_pattern_recall_through_orbvoc_roundtrip",
    "test_cross_space_pattern_degrades",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _SLOW_MODULES
                or item.originalname in _SLOW_TESTS
                or item.name in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
        if (item.originalname in _HEAVY_TESTS
                or item.name in _HEAVY_TESTS):
            item.add_marker(pytest.mark.heavy)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(_RNG_SEED)


@pytest.fixture(scope="session")
def rgb_1080p(rng):
    """Seed-pinned 1080p RGB u8 frame (reference conftest fixture)."""
    return rng.integers(0, 256, size=(1080, 1920, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def rgb_small(rng):
    return rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def dog_rgb():
    """The reference's canonical test image (tests/data/dog.jpeg)."""
    from PIL import Image as PILImage

    path = "/root/reference/tests/data/dog.jpeg"
    if not os.path.exists(path):
        pytest.skip("reference dog.jpeg not available")
    return np.asarray(PILImage.open(path).convert("RGB"))


@pytest.fixture(scope="session")
def gray_small(rgb_small):
    import cv2

    return cv2.cvtColor(rgb_small, cv2.COLOR_RGB2GRAY)

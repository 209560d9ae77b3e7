"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from kornia_tpu.ops import pallas_kernels as pk
from kornia_tpu.ops import preprocess as pp
from kornia_tpu.features import fast


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


class TestFusedPreprocessPallas:
    def test_matches_xla_path(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (96, 128, 3), np.uint8))
        mean = (0.485, 0.456, 0.406)
        std = (0.229, 0.224, 0.225)
        cfg = pp.PreprocessorConfig(
            out_size=(64, 64), normalize=pp.NormalizeMode.MEAN_STD,
            mean=mean, std=std)
        ref = np.asarray(pp.resize_normalize_to_tensor(img, cfg))[0]
        got = np.asarray(pk.fused_preprocess_pallas(
            img, 64, 64, mean, std))
        assert got.shape == (3, 64, 64)
        # the XLA path runs its MXU passes in bf16 (u8 inputs exact,
        # weight rounding ≤ 1 u8 LSB — ops/preprocess.py); the Pallas
        # kernel is full f32, so compare within the documented corridor
        # (1 LSB = 1/255/std ≈ 0.0175 in normalized units)
        np.testing.assert_allclose(got, ref, atol=0.02)

    def test_unit_scale(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (64, 128, 3), np.uint8))
        got = np.asarray(pk.fused_preprocess_pallas(img, 64, 128))
        np.testing.assert_allclose(
            got, np.asarray(img).transpose(2, 0, 1) / 255.0, atol=1e-6)


class TestFastScorePallas:
    def test_matches_jnp_path(self, rng):
        g = jnp.asarray(rng.integers(0, 256, (64, 160), np.uint8))
        ref = np.asarray(fast.fast_score(g, 20.0))
        got = np.asarray(pk.fast_score_pallas(g, 20.0))
        np.testing.assert_array_equal(got, ref)

    def test_ragged_shapes(self, rng):
        # H not a multiple of the row tile, W not a multiple of 128
        g = jnp.asarray(rng.integers(0, 256, (53, 97), np.uint8))
        ref = np.asarray(fast.fast_score(g, 15.0))
        got = np.asarray(pk.fast_score_pallas(g, 15.0))
        np.testing.assert_array_equal(got, ref)

    def test_env_variant_switch(self, rng, monkeypatch):
        g = jnp.asarray(rng.integers(0, 256, (48, 64), np.uint8))
        ref = fast.fast_detect(g, threshold=20.0, max_keypoints=64)
        monkeypatch.setenv("KORNIA_TPU_FAST", "pallas")
        got = fast.fast_detect(g, threshold=20.0, max_keypoints=64)
        np.testing.assert_array_equal(np.asarray(got.xy),
                                      np.asarray(ref.xy))
        np.testing.assert_array_equal(np.asarray(got.mask),
                                      np.asarray(ref.mask))


class TestLaneGather:
    def test_matches_take_along_axis(self, rng):
        for n in (5, 512, 700):
            src = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, 128, (n, 128), np.int32))
            ref = np.take_along_axis(np.asarray(src), np.asarray(idx), 1)
            np.testing.assert_array_equal(
                np.asarray(pk.lane_gather(src, idx)), ref)

    def test_rejects_non_128_lanes(self, rng):
        src = jnp.zeros((8, 64), jnp.float32)
        with pytest.raises(ValueError):
            pk.lane_gather(src, jnp.zeros((8, 64), jnp.int32))


class TestExtractWindowsPallas:
    def test_matches_vmap_slice_path(self, rng):
        from kornia_tpu.features import orb

        for h, w in ((240, 320), (97, 131)):
            img = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
            k = 21
            xs = rng.integers(0, w, k)
            ys = rng.integers(0, h, k)
            xs[:4] = [0, w - 1, 1, w - 2]
            ys[:4] = [0, h - 1, h - 1, 0]
            xy = jnp.asarray(np.stack([xs, ys], 1).astype(np.int32))
            ref = np.asarray(orb._extract_windows(img, xy))
            got = np.asarray(pk.extract_windows_pallas(img, xy))
            np.testing.assert_array_equal(got, ref)


def test_brief_sample_pallas_matches_xla(rng):
    """The VMEM-resident BRIEF tap sampler (interpret mode on CPU) must
    match the lane_gather + one-hot XLA formulation bit-for-bit."""
    import jax.numpy as jnp
    from kornia_tpu.features import orb
    from kornia_tpu.ops.pallas_kernels import brief_sample_pallas

    k = 37
    win = jnp.asarray(rng.random((k, 48, 128)).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, k).astype(np.float32))
    import os

    for pattern in ("rublee2011", "seeded"):
        # compute via both paths through the env switch
        os.environ["KORNIA_TPU_BRIEF"] = "xla"
        try:
            b_xla = np.asarray(orb.brief_from_windows(win, ang, 7, pattern))
        finally:
            os.environ["KORNIA_TPU_BRIEF"] = "pallas"
        try:
            b_pl = np.asarray(orb.brief_from_windows(win, ang, 7, pattern))
        finally:
            os.environ.pop("KORNIA_TPU_BRIEF", None)
        np.testing.assert_array_equal(b_pl, b_xla)


def test_fast_score_fused_nms_matches_composition(rng):
    """fast_score_pallas(nms=True) (interpret mode on CPU) must equal
    nms_maxpool(fast_score(...)) bit-for-bit — including image borders
    where reduce_window's -inf SAME padding meets the fused kernel's
    zeroed halo rows."""
    from kornia_tpu.features import fast
    from kornia_tpu.ops.pallas_kernels import fast_score_pallas
    import jax.numpy as jnp

    for shape in ((64, 128), (57, 200)):
        img = jnp.asarray(
            (rng.random(shape) * 255).astype(np.uint8))
        want = np.asarray(fast.nms_maxpool(fast.fast_score(img, 12.0)))
        got = np.asarray(fast_score_pallas(img, 12.0, nms=True))
        np.testing.assert_array_equal(got, want)
        # and the nms=False contract is unchanged
        np.testing.assert_array_equal(
            np.asarray(fast_score_pallas(img, 12.0)),
            np.asarray(fast.fast_score(img, 12.0)))

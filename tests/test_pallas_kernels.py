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
        np.testing.assert_allclose(got, ref, atol=1e-5)

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

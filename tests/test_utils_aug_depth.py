"""Tests: tensor-ops parity layer, tracing, augmentations, depth ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kornia_tpu import augmentations as aug
from kornia_tpu.ops import depth as depth_mod
from kornia_tpu.utils import Tracer, tensor_ops as tops


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


class TestTensorOps:
    def test_arithmetic(self, rng):
        a = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
        np.testing.assert_allclose(tops.add(a, b), np.asarray(a) + np.asarray(b))
        np.testing.assert_allclose(tops.sub(a, b), np.asarray(a) - np.asarray(b))
        np.testing.assert_allclose(tops.mul(a, b), np.asarray(a) * np.asarray(b))

    def test_shape_mismatch_raises(self):
        with pytest.raises(tops.ShapeMismatchError):
            tops.add(jnp.zeros((2, 3)), jnp.zeros((3, 2)))

    def test_dim_bounds(self):
        with pytest.raises(tops.DimOutOfBoundsError):
            tops.sum_elements(jnp.zeros((2, 3)), 5)
        out = tops.sum_elements(jnp.ones((2, 3)), 0)
        np.testing.assert_allclose(out, [2, 2, 2])

    def test_cosine(self):
        a = jnp.asarray([1.0, 0.0])
        b = jnp.asarray([0.0, 1.0])
        assert float(tops.cosine_similarity(a, a)) == pytest.approx(1.0)
        assert float(tops.cosine_similarity(a, b)) == pytest.approx(0.0)
        assert float(tops.cosine_distance(a, b)) == pytest.approx(1.0)

    def test_dot_requires_rank1(self):
        with pytest.raises(tops.DimOutOfBoundsError):
            tops.dot_product1(jnp.zeros((2, 2)), jnp.zeros((2, 2)))


class TestTracer:
    def test_disabled_by_default(self, monkeypatch):
        monkeypatch.delenv("KORNIA_TPU_TRACE", raising=False)
        t = Tracer()
        with t.stage("x"):
            pass
        assert t.summary() == {}

    def test_accumulates(self):
        import io
        buf = io.StringIO()
        t = Tracer(force=True, stream=buf)
        for _ in range(3):
            with t.stage("op", sync=jnp.ones(4)):
                _ = jnp.sum(jnp.ones(4))
        s = t.summary()
        assert s["op"]["count"] == 3
        assert s["op"]["total_ms"] > 0
        assert "[trace] op" in buf.getvalue()


class TestAugmentations:
    def _img(self, rng):
        return jnp.asarray(rng.integers(0, 256, (32, 40, 3), np.uint8))

    def test_seed_replay(self, rng):
        img = self._img(rng)
        pipe = aug.AugmentationPipeline(
            [aug.RandomHorizontalFlip(), aug.ColorJitter(),
             aug.RandomAffine()], seed=7)
        outs1 = [np.asarray(pipe(img)) for _ in range(3)]
        pipe.set_seed(7)
        outs2 = [np.asarray(pipe(img)) for _ in range(3)]
        for a, b in zip(outs1, outs2):
            np.testing.assert_array_equal(a, b)
        # different draws differ (flip probability etc.)
        assert any(not np.array_equal(outs1[0], o) for o in outs1[1:])

    def test_hflip_prob_extremes(self, rng):
        img = self._img(rng)
        always = aug.RandomHorizontalFlip(p=1.0)(
            jax.random.PRNGKey(0), img)
        never = aug.RandomHorizontalFlip(p=0.0)(
            jax.random.PRNGKey(0), img)
        np.testing.assert_array_equal(np.asarray(never), np.asarray(img))
        np.testing.assert_array_equal(
            np.asarray(always), np.asarray(img)[:, ::-1])

    def test_erasing_changes_area(self, rng):
        img = self._img(rng)
        out = aug.RandomErasing(p=1.0)(jax.random.PRNGKey(1), img)
        diff = (np.asarray(out) != np.asarray(img)).any(-1)
        assert 0.01 < diff.mean() < 0.4

    def test_batch_vmap(self, rng):
        imgs = jnp.asarray(rng.integers(0, 256, (4, 16, 16, 3), np.uint8))
        pipe = aug.AugmentationPipeline([aug.ColorJitter()], seed=0)
        out = pipe.apply_batch(jax.random.PRNGKey(0), imgs)
        assert out.shape == imgs.shape
        # independent keys → different transforms per image
        d01 = np.asarray(out[0]).astype(int) - np.asarray(imgs[0]).astype(int)
        d11 = np.asarray(out[1]).astype(int) - np.asarray(imgs[1]).astype(int)
        assert not np.array_equal(d01, d11)

    def test_dtype_preserved(self, rng):
        img_u8 = self._img(rng)
        img_f = img_u8.astype(jnp.float32) / 255.0
        for a in (aug.ColorJitter(), aug.RandomGaussianBlur(p=1.0),
                  aug.RandomErasing(p=1.0)):
            assert a(jax.random.PRNGKey(0), img_u8).dtype == jnp.uint8
            assert a(jax.random.PRNGKey(0), img_f).dtype == jnp.float32


class TestDepth:
    def test_sample_depth_nearest(self):
        d = jnp.zeros((10, 10)).at[5, 5].set(2.0)
        xy = jnp.asarray([[5.2, 4.9], [0.0, 0.0], [50.0, 5.0]])
        val, ok = depth_mod.sample_depth(d, xy)
        assert float(val[0]) == 2.0 and bool(ok[0])
        assert not bool(ok[1])  # zero depth = invalid
        assert not bool(ok[2])  # out of bounds

    def test_sample_depth_bilinear_holes(self):
        d = jnp.full((8, 8), 3.0).at[4, 4].set(0.0)
        val, ok = depth_mod.sample_depth(
            d, jnp.asarray([[4.5, 4.5], [1.5, 1.5]]), mode="bilinear")
        assert not bool(ok[0])  # touches the hole
        assert bool(ok[1]) and float(val[1]) == pytest.approx(3.0)

    def test_sample_depth_window_median(self):
        d = jnp.full((9, 9), 1.5).at[4, 4].set(0.0)
        val, ok = depth_mod.sample_depth(
            d, jnp.asarray([[4.0, 4.0]]), window=1)
        assert bool(ok[0]) and float(val[0]) == pytest.approx(1.5)

    def test_depth_to_3d_roundtrip(self, rng):
        k = jnp.asarray([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
        d = jnp.asarray(rng.uniform(1, 5, (24, 32)), jnp.float32)
        pts = depth_mod.depth_to_3d(d, k)
        # reproject
        z = pts[..., 2]
        u = pts[..., 0] / z * 100 + 16
        v = pts[..., 1] / z * 100 + 12
        gu, gv = np.meshgrid(np.arange(32), np.arange(24))
        np.testing.assert_allclose(np.asarray(u), gu, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), gv, atol=1e-4)
        np.testing.assert_allclose(np.asarray(z), np.asarray(d))

    def test_normals_flat_plane(self):
        k = jnp.asarray([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
        d = jnp.full((24, 32), 2.0)
        n = depth_mod.depth_to_normals(d, k)
        inner = np.asarray(n)[4:-4, 4:-4]
        np.testing.assert_allclose(
            np.abs(inner[..., 2]), 1.0, atol=1e-5)

    def test_warp_frame_depth_identity(self, rng):
        k = jnp.asarray([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
        img = jnp.asarray(rng.integers(0, 255, (24, 32), np.uint8))
        d = jnp.full((24, 32), 2.0)
        out = depth_mod.warp_frame_depth(img, d, jnp.eye(4), k)
        np.testing.assert_allclose(
            np.asarray(out)[2:-2, 2:-2],
            np.asarray(img)[2:-2, 2:-2], atol=1)

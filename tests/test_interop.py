"""Zero-copy interop tests (reference: kornia-py test_dlpack.py,
test_torch_zero_copy.py, test_zero_copy_io.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kornia_tpu.image import ColorSpace, Image


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(9)


class TestDlpack:
    def test_jax_roundtrip(self, rng):
        arr = rng.integers(0, 256, (12, 16, 3), np.uint8)
        img = Image.from_numpy(arr, color_space=ColorSpace.RGB)
        back = jnp.from_dlpack(img)
        np.testing.assert_array_equal(np.asarray(back), arr)

    def test_from_numpy_producer(self, rng):
        arr = rng.standard_normal((8, 10)).astype(np.float32)
        img = Image.from_dlpack(arr)
        np.testing.assert_array_equal(img.numpy(), arr)


class TestTorch:
    def test_torch_roundtrip(self, rng):
        import torch

        arr = rng.integers(0, 256, (6, 8, 3), np.uint8)
        img = Image.from_numpy(arr, color_space=ColorSpace.RGB)
        t = img.to_torch()
        assert isinstance(t, torch.Tensor)
        assert t.shape == (6, 8, 3)
        np.testing.assert_array_equal(t.numpy(), arr)

        img2 = Image.from_torch(torch.as_tensor(arr.astype(np.float32)))
        np.testing.assert_array_equal(img2.numpy(), arr.astype(np.float32))

    def test_torch_compute_chain(self, rng):
        """torch → kornia_tpu op → torch, values preserved."""
        import torch

        from kornia_tpu.ops import color

        arr = rng.integers(0, 256, (10, 12, 3), np.uint8)
        t_in = torch.as_tensor(arr)
        img = Image.from_torch(t_in, color_space=ColorSpace.RGB)
        gray = color.rgb_to_gray(img.data)
        t_out = Image(data=gray, color_space=ColorSpace.GRAY).to_torch()
        ref = color.rgb_to_gray(jnp.asarray(arr))
        np.testing.assert_array_equal(t_out.numpy(), np.asarray(ref))


class TestArrowInterop:
    """Reference arrow.rs wire schema: StructArray
    {width, height, channels: u32[1], data: binary[1]}."""

    def test_roundtrip(self):
        import pyarrow as pa

        from kornia_tpu.image import ColorSpace, Image

        rng = np.random.default_rng(0)
        host = rng.integers(0, 256, (33, 47, 3), np.uint8)
        img = Image.from_numpy(host, color_space=ColorSpace.RGB)
        arr = img.to_arrow()
        assert arr.type.num_fields == 4
        assert [arr.type.field(i).name for i in range(4)] == [
            "width", "height", "channels", "data"]
        back = Image.from_arrow(arr)
        np.testing.assert_array_equal(back.numpy(), host)

    def test_zero_copy_export(self):
        from kornia_tpu.image import Image

        host = np.zeros((8, 8, 3), np.uint8)
        arr = Image.from_numpy(host).to_arrow()
        data_buf = arr.field("data").buffers()[2]
        assert data_buf.size == 8 * 8 * 3  # pixel buffer wrapped whole

    def test_bad_inputs(self):
        import pyarrow as pa

        from kornia_tpu.image import Image
        import jax.numpy as jnp

        with pytest.raises(ValueError, match="u8"):
            Image(jnp.zeros((4, 4, 3), jnp.float32)).to_arrow()
        with pytest.raises(ValueError, match="Struct"):
            Image.from_arrow(pa.array([1, 2, 3]))

"""Image type and metadata.

The reference wraps a rank-3 tensor in ``Image<T, C>`` with typed color-space
newtypes (kornia-image/src/image.rs:136, color_spaces.rs). On TPU the idiomatic
design is the opposite: images are plain ``jax.Array``s flowing through jitted
functions, and metadata (size, color space, layout) is *static* Python data —
it must never become a traced value. :class:`Image` is therefore a frozen
pytree whose array leaf is the pixel data and whose metadata is aux_data, so
it can cross ``jax.jit`` boundaries with the metadata acting as part of the
trace signature (the moral equivalent of the reference's typed newtypes).

Residency: the reference tracks Host/Device residency at runtime and *errors*
on mixed-device ops (kornia-imgproc/src/cuda/dispatch.rs:1-14). The JAX
equivalent is sharding-aware dispatch — arrays carry their sharding, and we
never implicitly reshard frame-sized arrays (see kornia_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ColorSpace(enum.Enum):
    """Static color-space tag (reference: color_spaces.rs typed newtypes)."""

    UNKNOWN = "unknown"
    GRAY = "gray"
    RGB = "rgb"
    BGR = "bgr"
    RGBA = "rgba"
    BGRA = "bgra"
    HSV = "hsv"
    HLS = "hls"
    LAB = "lab"
    LUV = "luv"
    XYZ = "xyz"
    YUV = "yuv"
    # packed / planar video formats (host-side containers; converted to RGB
    # on device by kornia_tpu.ops.yuv)
    YUYV = "yuyv"
    UYVY = "uyvy"
    NV12 = "nv12"
    NV21 = "nv21"
    I420 = "i420"
    YV12 = "yv12"


class PixelFormat(enum.Enum):
    U8 = "u8"
    U16 = "u16"
    F32 = "f32"
    F64 = "f64"


class ImageLayout(enum.Enum):
    """Memory layout of the channel axis (reference: image.rs:71)."""

    HWC = "hwc"
    CHW = "chw"


class InterpolationMode(enum.Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    LANCZOS = "lanczos"
    AREA = "area"


@dataclasses.dataclass(frozen=True)
class ImageSize:
    """(width, height) pair; reference image.rs:23."""

    width: int
    height: int

    def __iter__(self):
        return iter((self.width, self.height))

    @property
    def wh(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def hw(self) -> Tuple[int, int]:
        return (self.height, self.width)


def _dtype_to_pixel_format(dtype) -> PixelFormat:
    dtype = jnp.dtype(dtype)
    if dtype == jnp.uint8:
        return PixelFormat.U8
    if dtype == jnp.uint16:
        return PixelFormat.U16
    if dtype == jnp.float32:
        return PixelFormat.F32
    if dtype == jnp.float64:
        return PixelFormat.F64
    raise ValueError(f"unsupported image dtype: {dtype}")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Image:
    """A pixel array plus static metadata.

    ``data`` is (H, W, C) for HWC layout or (C, H, W) for CHW; leading batch
    dimensions are allowed ((..., H, W, C)). Metadata participates in the jit
    trace signature, so converting color space at trace time is free.
    """

    data: jax.Array
    color_space: ColorSpace = ColorSpace.UNKNOWN
    layout: ImageLayout = ImageLayout.HWC

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.color_space, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        color_space, layout = aux
        return cls(children[0], color_space, layout)

    # -- construction ----------------------------------------------------
    @classmethod
    def from_numpy(
        cls,
        array: np.ndarray,
        color_space: ColorSpace = ColorSpace.RGB,
        layout: ImageLayout = ImageLayout.HWC,
    ) -> "Image":
        return cls(jnp.asarray(array), color_space, layout)

    @classmethod
    def from_size_val(
        cls,
        size: ImageSize,
        val,
        channels: int = 3,
        dtype=jnp.uint8,
        color_space: ColorSpace = ColorSpace.RGB,
    ) -> "Image":
        """Reference image.rs:288 ``from_size_val``."""
        data = jnp.full((size.height, size.width, channels), val, dtype=dtype)
        return cls(data, color_space, ImageLayout.HWC)

    # -- accessors -------------------------------------------------------
    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def pixel_format(self) -> PixelFormat:
        return _dtype_to_pixel_format(self.data.dtype)

    @property
    def height(self) -> int:
        return self.data.shape[-3] if self.layout is ImageLayout.HWC else self.data.shape[-2]

    @property
    def width(self) -> int:
        return self.data.shape[-2] if self.layout is ImageLayout.HWC else self.data.shape[-1]

    @property
    def channels(self) -> int:
        return self.data.shape[-1] if self.layout is ImageLayout.HWC else self.data.shape[-3]

    @property
    def size(self) -> ImageSize:
        return ImageSize(self.width, self.height)

    # -- conversions (reference image.rs:352-655) ------------------------
    def cast(self, dtype) -> "Image":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    def cast_and_scale(self, dtype, scale: float) -> "Image":
        """u8→f32-style cast-then-scale (reference image.rs:430)."""
        return dataclasses.replace(
            self, data=self.data.astype(dtype) * jnp.asarray(scale, dtype)
        )

    def scale_and_cast(self, dtype, scale: float) -> "Image":
        """f32→u8-style scale-then-round-cast (reference image.rs:470)."""
        scaled = self.data.astype(jnp.float32) * scale
        if jnp.dtype(dtype) in (jnp.uint8, jnp.uint16):
            info = jnp.iinfo(dtype)
            scaled = jnp.clip(jnp.round(scaled), info.min, info.max)
        return dataclasses.replace(self, data=scaled.astype(dtype))

    def to_chw(self) -> "Image":
        if self.layout is ImageLayout.CHW:
            return self
        return Image(jnp.moveaxis(self.data, -1, -3), self.color_space, ImageLayout.CHW)

    def to_hwc(self) -> "Image":
        if self.layout is ImageLayout.HWC:
            return self
        return Image(jnp.moveaxis(self.data, -3, -1), self.color_space, ImageLayout.HWC)

    def channel(self, i: int) -> jax.Array:
        """Extract one channel as (H, W); reference image.rs:560."""
        if self.layout is ImageLayout.HWC:
            return self.data[..., i]
        return self.data[..., i, :, :]

    def split_channels(self):
        """Reference image.rs:595."""
        axis = -1 if self.layout is ImageLayout.HWC else -3
        n = self.data.shape[axis]
        return [jnp.take(self.data, i, axis=axis) for i in range(n)]

    def map(self, fn) -> "Image":
        return dataclasses.replace(self, data=fn(self.data))

    def numpy(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.data))

    # DLPack interop (reference kornia-tensor/src/dlpack.rs:73,
    # kornia-py/src/dlpack.rs __dlpack__/__cuda_array_interface__)
    def __dlpack__(self, stream: Any = None):
        return self.data.__dlpack__(stream=stream)

    def __dlpack_device__(self):
        return self.data.__dlpack_device__()

    @classmethod
    def from_dlpack(cls, ext_tensor, color_space=None) -> "Image":
        """Zero-copy import of any __dlpack__ producer (torch, numpy,
        cupy, …) — reference: numpy-as-borrowed-ForeignResource
        (kornia-tensor/src/resource.rs:229)."""
        arr = jnp.from_dlpack(ext_tensor)
        return cls(data=arr, color_space=color_space or ColorSpace.UNKNOWN)

    def to_torch(self):
        """Export to a torch tensor via DLPack (zero-copy on shared
        backends; reference: kornia-py test_torch_zero_copy.py)."""
        import torch.utils.dlpack as tdl

        return tdl.from_dlpack(self.data)

    @classmethod
    def from_torch(cls, tensor, color_space=None) -> "Image":
        """Import a torch tensor via DLPack."""
        return cls.from_dlpack(tensor, color_space=color_space)

    # Arrow interop (reference kornia-image/src/arrow.rs IntoArrow/
    # TryFromArrow: a StructArray {width,height,channels: u32[1],
    # data: binary[1]} — the same wire schema, so arrays round-trip
    # between the two frameworks)
    def to_arrow(self):
        """Export as an Arrow StructArray (arrow.rs:40 ``into_arrow``).

        u8 HWC only, like the reference impl. The pixel buffer is
        wrapped zero-copy (``pa.py_buffer`` over the host array).
        """
        import pyarrow as pa

        if self.layout is not ImageLayout.HWC:
            raise ValueError("to_arrow requires HWC layout")
        host = self.numpy()
        if host.dtype != np.uint8 or host.ndim != 3:
            raise ValueError(
                "to_arrow supports (H, W, C) u8 images (reference "
                "arrow.rs implements Image<u8, C> only)")
        h, w, c = host.shape
        host = np.ascontiguousarray(host)
        nbytes = host.size
        offsets = np.asarray([0, nbytes], np.int32)
        data_arr = pa.Array.from_buffers(
            pa.binary(), 1,
            [None, pa.py_buffer(offsets), pa.py_buffer(host)])
        return pa.StructArray.from_arrays(
            [pa.array([w], pa.uint32()), pa.array([h], pa.uint32()),
             pa.array([c], pa.uint32()), data_arr],
            names=["width", "height", "channels", "data"])

    @classmethod
    def from_arrow(cls, array, color_space=None) -> "Image":
        """Import the reference's Arrow image encoding
        (arrow.rs:67 ``try_from_arrow``)."""
        import pyarrow as pa

        if isinstance(array, pa.ChunkedArray):
            array = array.combine_chunks()
        if not pa.types.is_struct(array.type):
            raise ValueError("expected a StructArray image encoding")
        w = array.field("width")[0].as_py()
        h = array.field("height")[0].as_py()
        c = array.field("channels")[0].as_py()
        data = array.field("data")[0].as_py()
        buf = np.frombuffer(data, np.uint8)
        if buf.size != h * w * c:
            raise ValueError(
                f"data length {buf.size} != {h}x{w}x{c}")
        return cls.from_numpy(buf.reshape(h, w, c),
                              color_space=color_space or ColorSpace.UNKNOWN)


def as_array(img) -> jax.Array:
    """Accept either an Image or a bare array; return the array."""
    if isinstance(img, Image):
        return img.data
    return jnp.asarray(img)

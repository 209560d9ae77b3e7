"""I/O subsystem: image codecs, depth codecs, pointcloud and SfM-model
formats, dataset readers, and capture utilities.

TPU-native equivalent of the reference's ``kornia-io`` crate plus the 3D
I/O half of ``kornia-3d`` (reference: crates/kornia-io/src/lib.rs:12-40,
crates/kornia-3d/src/io/). Decoding stays host-side (numpy), exactly like
the reference keeps codecs on CPU; arrays move to the accelerator only at
an explicit ``jnp.asarray`` boundary — the TPU analogue of the reference's
explicit ``to_cuda`` contract (kornia-image/src/cuda.rs:36).
"""

from kornia_tpu.io.image_io import (
    read_image_any_rgb8,
    read_image_any_gray8,
    read_image_jpeg_rgb8,
    read_image_jpeg_gray8,
    read_image_png_rgb8,
    read_image_png_rgba8,
    read_image_png_gray8,
    read_image_png_gray16,
    read_image_tiff,
    read_image_webp_rgb8,
    write_image_jpeg,
    write_image_png,
    write_image_tiff,
    write_image_webp,
    read_exif_orientation,
)
from kornia_tpu.io.rvl import rvl_compress, rvl_decompress
from kornia_tpu.io.ply import read_ply, write_ply
from kornia_tpu.io.pcd import read_pcd, write_pcd
from kornia_tpu.io.colmap import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3d,
    read_cameras_txt,
    read_images_txt,
    read_points3d_txt,
    read_colmap_model,
)
from kornia_tpu.io.datasets import (
    TumRgbdDataset,
    EurocDataset,
    KittiOdometryDataset,
)
from kornia_tpu.io.fps_counter import FpsCounter
from kornia_tpu.io.video import (
    CameraCapture,
    NativeCapture,
    VideoError,
    VideoReader,
    VideoWriter,
)
from kornia_tpu.io.mjpeg_avi import MjpegReader, MjpegWriter

__all__ = [
    "read_image_any_rgb8",
    "read_image_any_gray8",
    "read_image_jpeg_rgb8",
    "read_image_jpeg_gray8",
    "read_image_png_rgb8",
    "read_image_png_rgba8",
    "read_image_png_gray8",
    "read_image_png_gray16",
    "read_image_tiff",
    "read_image_webp_rgb8",
    "write_image_jpeg",
    "write_image_png",
    "write_image_tiff",
    "write_image_webp",
    "read_exif_orientation",
    "rvl_compress",
    "rvl_decompress",
    "read_ply",
    "write_ply",
    "read_pcd",
    "write_pcd",
    "ColmapCamera",
    "CameraCapture",
    "NativeCapture",
    "VideoError",
    "VideoReader",
    "VideoWriter",
    "MjpegReader",
    "MjpegWriter",
    "ColmapImage",
    "ColmapPoint3d",
    "read_cameras_txt",
    "read_images_txt",
    "read_points3d_txt",
    "read_colmap_model",
    "TumRgbdDataset",
    "EurocDataset",
    "KittiOdometryDataset",
    "FpsCounter",
]

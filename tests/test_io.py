"""I/O subsystem tests: codecs, RVL, PLY/PCD, COLMAP, datasets.

Mirrors the reference's test strategy (SURVEY.md §4): round-trips with
exactness asserted where the math is exact (PNG/TIFF lossless, RVL
lossless), tolerance corridors for lossy codecs (JPEG/WebP).
"""

import os

import numpy as np
import pytest

from kornia_tpu import io as kio
from kornia_tpu.io import rvl as rvl_mod
from kornia_tpu.io.image_io import IoError


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="module")
def rgb(rng):
    return rng.integers(0, 256, (48, 64, 3), np.uint8)


class TestImageCodecs:
    def test_png_roundtrip_exact(self, tmp_path, rgb):
        p = str(tmp_path / "a.png")
        kio.write_image_png(p, rgb)
        out = kio.read_image_png_rgb8(p)
        np.testing.assert_array_equal(out, rgb)

    def test_png_gray16_roundtrip(self, tmp_path, rng):
        depth = rng.integers(0, 65536, (32, 40), np.uint16)
        p = str(tmp_path / "d.png")
        kio.write_image_png(p, depth)
        out = kio.read_image_png_gray16(p)
        np.testing.assert_array_equal(out[:, :, 0], depth)

    def test_jpeg_roundtrip_lossy_corridor(self, tmp_path):
        # smooth image → JPEG error stays small
        y, x = np.mgrid[0:48, 0:64]
        img = np.stack([x * 2, y * 3, (x + y)], -1).astype(np.uint8)
        p = str(tmp_path / "a.jpg")
        kio.write_image_jpeg(p, img, quality=95)
        out = kio.read_image_jpeg_rgb8(p)
        assert out.shape == img.shape
        assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 4.0

    def test_tiff_f32_roundtrip(self, tmp_path, rng):
        img = rng.standard_normal((20, 30)).astype(np.float32)
        p = str(tmp_path / "a.tif")
        kio.write_image_tiff(p, img)
        out = kio.read_image_tiff(p)
        np.testing.assert_array_equal(out[:, :, 0], img)

    def test_webp_lossless_roundtrip(self, tmp_path, rgb):
        p = str(tmp_path / "a.webp")
        kio.write_image_webp(p, rgb, lossless=True)
        out = kio.read_image_webp_rgb8(p)
        np.testing.assert_array_equal(out, rgb)

    def test_read_any_formats(self, tmp_path, rgb):
        for name in ("x.png", "x.webp"):
            kio.write_image_png(str(tmp_path / "x.png"), rgb)
        out = kio.read_image_any_rgb8(str(tmp_path / "x.png"))
        np.testing.assert_array_equal(out, rgb)
        gray = kio.read_image_any_gray8(str(tmp_path / "x.png"))
        assert gray.shape == (48, 64, 1)

    def test_bad_extension_rejected(self, tmp_path, rgb):
        with pytest.raises(IoError):
            kio.read_image_jpeg_rgb8(str(tmp_path / "a.png"))
        with pytest.raises(IoError):
            kio.write_image_png(str(tmp_path / "a.jpg"), rgb)

    def test_missing_file(self):
        with pytest.raises(IoError):
            kio.read_image_any_rgb8("/nonexistent/file.png")


class TestRvl:
    def _depth(self, rng, h=64, w=80):
        depth = rng.integers(500, 5000, (h, w)).astype(np.uint16)
        depth[rng.random((h, w)) < 0.4] = 0  # typical depth holes
        return depth

    def test_roundtrip(self, rng):
        depth = self._depth(rng)
        blob = kio.rvl_compress(depth)
        assert blob[:4] == b"RVL1"
        out = kio.rvl_decompress(blob)
        np.testing.assert_array_equal(out, depth)

    def test_compresses_sparse(self, rng):
        depth = np.zeros((100, 100), np.uint16)
        depth[40:50, 40:50] = 1234
        blob = kio.rvl_compress(depth)
        assert len(blob) < depth.nbytes / 10

    def test_all_zero_and_all_dense(self, rng):
        for depth in (np.zeros((16, 16), np.uint16),
                      rng.integers(1, 65535, (16, 16)).astype(np.uint16)):
            np.testing.assert_array_equal(
                kio.rvl_decompress(kio.rvl_compress(depth)), depth)

    def test_python_fallback_matches_native(self, rng):
        depth = self._depth(rng, 32, 32)
        flat = depth.reshape(-1)
        py_blob = rvl_mod._compress_py(flat)
        out = rvl_mod._decompress_py(py_blob, flat.size)
        np.testing.assert_array_equal(out, flat)
        # native and python payloads must be byte-identical
        native_blob = kio.rvl_compress(depth)[12:]
        assert native_blob == py_blob

    def test_header_hardening(self):
        import struct
        with pytest.raises(rvl_mod.RvlError):
            kio.rvl_decompress(b"JUNK" + b"\x00" * 20)
        huge = b"RVL1" + struct.pack("<II", 100000, 100000)
        with pytest.raises(rvl_mod.RvlError):
            kio.rvl_decompress(huge)

    def test_truncated_stream(self, rng):
        blob = kio.rvl_compress(self._depth(rng))
        with pytest.raises(rvl_mod.RvlError):
            kio.rvl_decompress(blob[: len(blob) // 2])


class TestPly:
    def test_roundtrip_binary(self, tmp_path, rng):
        pts = rng.standard_normal((100, 3))
        cols = rng.integers(0, 256, (100, 3), np.uint8)
        nrm = rng.standard_normal((100, 3))
        p = str(tmp_path / "a.ply")
        kio.write_ply(p, pts, colors=cols, normals=nrm, binary=True)
        out = kio.read_ply(p)
        np.testing.assert_allclose(out["points"], pts)
        np.testing.assert_array_equal(out["colors"], cols)
        np.testing.assert_allclose(out["normals"], nrm)

    def test_roundtrip_ascii(self, tmp_path, rng):
        pts = rng.standard_normal((10, 3))
        p = str(tmp_path / "a.ply")
        kio.write_ply(p, pts, binary=False)
        out = kio.read_ply(p)
        np.testing.assert_allclose(out["points"], pts, rtol=1e-12)


class TestPcd:
    def test_roundtrip_binary(self, tmp_path, rng):
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (50, 3), np.uint8)
        p = str(tmp_path / "a.pcd")
        kio.write_pcd(p, pts, colors=cols, binary=True)
        out = kio.read_pcd(p)
        np.testing.assert_allclose(out["points"], pts, rtol=1e-6)
        np.testing.assert_array_equal(out["colors"], cols)

    def test_roundtrip_ascii(self, tmp_path, rng):
        pts = rng.standard_normal((8, 3)).astype(np.float32)
        p = str(tmp_path / "a.pcd")
        kio.write_pcd(p, pts, binary=False)
        out = kio.read_pcd(p)
        np.testing.assert_allclose(out["points"], pts, rtol=1e-6)


COLMAP_CAMERAS = """\
# Camera list with one line of data per camera:
#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]
1 PINHOLE 640 480 500.0 505.0 320.0 240.0
2 SIMPLE_RADIAL 640 480 500.0 320.0 240.0 0.01
"""

COLMAP_IMAGES = """\
# Image list with two lines of data per image
1 0.9999 0.01 0.0 0.0 0.1 0.2 0.3 1 frame001.png
10.0 20.0 5 30.0 40.0 -1
2 1.0 0.0 0.0 0.0 0.0 0.0 0.0 1 frame002.png
15.0 25.0 5
"""

COLMAP_POINTS = """\
# 3D point list
5 1.0 2.0 3.0 255 128 0 0.5 1 0 2 0
"""


class TestColmap:
    @pytest.fixture()
    def model_dir(self, tmp_path):
        (tmp_path / "cameras.txt").write_text(COLMAP_CAMERAS)
        (tmp_path / "images.txt").write_text(COLMAP_IMAGES)
        (tmp_path / "points3D.txt").write_text(COLMAP_POINTS)
        return str(tmp_path)

    def test_full_model(self, model_dir):
        cams, imgs, pts = kio.read_colmap_model(model_dir)
        assert set(cams) == {1, 2}
        assert cams[1].model == "PINHOLE"
        k = cams[1].k_matrix()
        assert k[0, 0] == 500.0 and k[1, 2] == 240.0
        # SIMPLE_RADIAL: fx == fy
        k2 = cams[2].k_matrix()
        assert k2[0, 0] == k2[1, 1] == 500.0

        assert set(imgs) == {1, 2}
        im = imgs[1]
        assert im.name == "frame001.png"
        assert im.xys.shape == (2, 2)
        assert list(im.point3d_ids) == [5, -1]
        r = im.rotation_matrix()
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)

        assert set(pts) == {5}
        assert pts[5].track == [(1, 0), (2, 0)]
        np.testing.assert_array_equal(pts[5].rgb, [255, 128, 0])

    def test_camera_center(self, model_dir):
        _, imgs, _ = kio.read_colmap_model(model_dir)
        im = imgs[2]  # identity rotation
        np.testing.assert_allclose(im.camera_center(), [0, 0, 0])


class TestDatasets:
    def test_tum_layout(self, tmp_path, rng):
        root = tmp_path / "tum"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        rgb_lines, dep_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
        for i in range(3):
            t = 1000.0 + i * 0.05
            rgb = rng.integers(0, 256, (24, 32, 3), np.uint8)
            kio.write_image_png(str(root / "rgb" / f"{t:.4f}.png"), rgb)
            d = rng.integers(0, 10000, (24, 32)).astype(np.uint16)
            kio.write_image_png(str(root / "depth" / f"{t:.4f}.png"), d)
            rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
            dep_lines.append(f"{t + 0.001:.4f} depth/{t:.4f}.png")
            gt_lines.append(f"{t:.4f} 0 0 0 0 0 0 1")
        (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
        (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
        (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

        ds = kio.TumRgbdDataset(str(root))
        assert len(ds) == 3
        fr = ds[1]
        assert fr.rgb.shape == (24, 32, 3)
        assert fr.depth.shape == (24, 32) and fr.depth.dtype == np.float32
        assert ds.groundtruth["poses"].shape == (3, 7)
        # TUM gt is tx ty tz qx qy qz qw → ours qw first
        assert ds.groundtruth["poses"][0, 0] == 1.0

    def test_kitti_layout(self, tmp_path, rng):
        root = tmp_path / "kitti"
        img_dir = root / "sequences" / "00" / "image_0"
        img_dir.mkdir(parents=True)
        (root / "poses").mkdir()
        for i in range(2):
            g = rng.integers(0, 256, (20, 30), np.uint8)
            kio.write_image_png(str(img_dir / f"{i:06d}.png"), g)
        (root / "sequences" / "00" / "times.txt").write_text("0.0\n0.1\n")
        pose = "1 0 0 0 0 1 0 0 0 0 1 0"
        (root / "poses" / "00.txt").write_text(pose + "\n" + pose + "\n")
        (root / "sequences" / "00" / "calib.txt").write_text(
            "P0: 700 0 600 0 0 700 180 0 0 0 1 0\n")

        ds = kio.KittiOdometryDataset(str(root), "00")
        assert len(ds) == 2
        assert ds[0].gray.shape == (20, 30)
        assert ds.poses.shape == (2, 4, 4)
        assert ds.calib["K"][0, 0] == 700

    def test_euroc_layout(self, tmp_path, rng):
        root = tmp_path / "euroc"
        data_dir = root / "mav0" / "cam0" / "data"
        data_dir.mkdir(parents=True)
        lines = ["#timestamp [ns],filename"]
        for i in range(2):
            ts = 1403636579763555584 + i * 50000000
            g = rng.integers(0, 256, (16, 24), np.uint8)
            kio.write_image_png(str(data_dir / f"{ts}.png"), g)
            lines.append(f"{ts},{ts}.png")
        (root / "mav0" / "cam0" / "data.csv").write_text(
            "\n".join(lines) + "\n")
        ds = kio.EurocDataset(str(root))
        assert len(ds) == 2
        assert ds[0].gray.shape == (16, 24)
        assert abs(ds.timestamps[1] - ds.timestamps[0] - 0.05) < 1e-6

    def test_associate(self):
        a = np.array([0.0, 0.1, 0.2])
        b = np.array([0.005, 0.11, 0.35])
        pairs = kio.datasets.associate_timestamps(a, b, max_dt=0.02) \
            if hasattr(kio, "datasets") else None
        from kornia_tpu.io.datasets import associate_timestamps
        pairs = associate_timestamps(a, b, max_dt=0.02)
        assert pairs.tolist() == [[0, 0], [1, 1]]


class TestFpsCounter:
    def test_basic(self):
        import time
        fps = kio.FpsCounter(window=10)
        assert fps.fps() == 0.0
        for _ in range(5):
            fps.tick()
            time.sleep(0.002)
        assert fps.fps() > 0
        fps.reset()
        assert fps.fps() == 0.0


class TestNativeCapture:
    """Native C++ capture layer (reference V4lVideoCapture,
    v4l/mod.rs:184 — mmap streaming + format negotiation). The
    directory-backed virtual camera drives the identical grab API so
    the full native path is exercised without camera hardware."""

    def test_dir_capture_roundtrip(self, tmp_path):
        import ctypes

        from kornia_tpu.io import NativeCapture
        from kornia_tpu.native import load_native_library

        lib = load_native_library()
        if lib is None:
            pytest.skip("native library unavailable")
        fn = lib.kornia_image_write_pnm
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                       ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, (48, 64, 3), np.uint8)
                  for _ in range(3)]
        for i, f in enumerate(frames):
            fc = np.ascontiguousarray(f)
            assert fn(str(tmp_path / f"f{i}.ppm").encode(),
                      fc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      48, 64, 3) == 0
        with NativeCapture("dir:" + str(tmp_path)) as cap:
            for i in range(5):      # loops past the end
                np.testing.assert_array_equal(cap.grab_frame(),
                                              frames[i % 3])

    def test_dir_capture_gray_promotes_to_rgb(self, tmp_path):
        import ctypes

        from kornia_tpu.io import NativeCapture
        from kornia_tpu.native import load_native_library

        lib = load_native_library()
        if lib is None:
            pytest.skip("native library unavailable")
        fn = lib.kornia_image_write_pnm
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                       ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        g = np.random.default_rng(1).integers(
            0, 256, (32, 40), np.uint8)
        gc = np.ascontiguousarray(g)
        assert fn(str(tmp_path / "g.pgm").encode(),
                  gc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  32, 40, 1) == 0
        with NativeCapture(str(tmp_path)) as cap:   # bare dir uri
            rgb = cap.grab_frame()
        assert rgb.shape == (32, 40, 3)
        np.testing.assert_array_equal(rgb[:, :, 0], g)
        np.testing.assert_array_equal(rgb[:, :, 1], g)

    def test_missing_device_errors_cleanly(self):
        from kornia_tpu.io import NativeCapture, VideoError
        from kornia_tpu.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")
        with pytest.raises(VideoError, match="video99"):
            NativeCapture("v4l2:/dev/video99")
        with pytest.raises(VideoError):
            NativeCapture("dir:/nonexistent_dir_xyz")


class TestMjpegAvi:
    """Built-in MJPEG/AVI muxer/demuxer (io/mjpeg_avi.py) — the
    codec-free VideoWriter/VideoReader path (reference
    gstreamer/video.rs), cross-validated against cv2's AVI stack."""

    @staticmethod
    def _frames(n=6, h=48, w=64):
        # smooth gradients + a moving square: JPEG-friendly content
        yy, xx = np.mgrid[0:h, 0:w]
        out = []
        for i in range(n):
            f = np.stack([
                (xx * 255 / (w - 1)),
                (yy * 255 / (h - 1)),
                np.full((h, w), 40.0 + 20 * i),
            ], axis=-1).astype(np.uint8)
            x0 = 4 + 6 * i
            f[10:30, x0:x0 + 12] = (220, 40, 40)
            out.append(f)
        return out

    def test_roundtrip_own_reader(self, tmp_path):
        from kornia_tpu.io.mjpeg_avi import MjpegReader, MjpegWriter

        frames = self._frames()
        path = str(tmp_path / "own.avi")
        with MjpegWriter(path, fps=12.5, size_hw=(48, 64),
                         quality=95) as w:
            for f in frames:
                w.write(f)
        r = MjpegReader(path)
        assert r.n_frames == len(frames)
        assert abs(r.fps - 12.5) < 1e-3
        assert r.size == (48, 64)
        for f in frames:
            got = r.read()
            assert got.shape == f.shape
            # JPEG is lossy; mean error small
            assert np.abs(got.astype(int) - f.astype(int)).mean() < 12
        assert r.read() is None

    def test_cv2_reads_our_file(self, tmp_path):
        import cv2

        from kornia_tpu.io.mjpeg_avi import MjpegWriter

        frames = self._frames()
        path = str(tmp_path / "ours_for_cv2.avi")
        with MjpegWriter(path, fps=30.0, size_hw=(48, 64),
                         quality=95) as w:
            for f in frames:
                w.write(f)
        cap = cv2.VideoCapture(path)
        assert cap.isOpened(), "cv2 cannot open our AVI"
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == len(frames)
        assert abs(cap.get(cv2.CAP_PROP_FPS) - 30.0) < 0.1
        n = 0
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            assert np.abs(rgb.astype(int)
                          - frames[n].astype(int)).mean() < 12
            n += 1
        assert n == len(frames)
        cap.release()

    def test_we_read_cv2_file(self, tmp_path):
        import cv2

        from kornia_tpu.io.mjpeg_avi import MjpegReader

        frames = self._frames()
        path = str(tmp_path / "cv2_for_us.avi")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                             25.0, (64, 48))
        assert vw.isOpened()
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        r = MjpegReader(path)
        assert r.n_frames == len(frames)
        assert abs(r.fps - 25.0) < 0.1
        for f in frames:
            got = r.read()
            assert got is not None
            assert np.abs(got.astype(int) - f.astype(int)).mean() < 15

    def test_gray_and_seek(self, tmp_path):
        from kornia_tpu.io.mjpeg_avi import MjpegReader, MjpegWriter

        frames = [f[..., 0] for f in self._frames()]
        path = str(tmp_path / "gray.avi")
        with MjpegWriter(path, fps=10, size_hw=(48, 64),
                         pixel_format="mono8") as w:
            for f in frames:
                w.write(f)
        r = MjpegReader(path, pixel_format="mono8")
        r.seek_frame(3)
        got = r.read()
        assert got.ndim == 2
        assert np.abs(got.astype(int) - frames[3].astype(int)).mean() < 12

    def test_videowriter_mjpg_codec_routes_native(self, tmp_path):
        from kornia_tpu.io import VideoReader, VideoWriter
        from kornia_tpu.io.mjpeg_avi import is_mjpeg_avi

        frames = self._frames(3)
        path = str(tmp_path / "via_api.avi")
        with VideoWriter(path, fps=15, size_hw=(48, 64),
                         codec="mjpg") as w:
            for f in frames:
                w.write(f)
        assert is_mjpeg_avi(path)
        with VideoReader(path) as r:
            assert r.read() is not None

    def test_bad_inputs(self, tmp_path):
        from kornia_tpu.io.mjpeg_avi import MjpegReader, MjpegWriter

        path = str(tmp_path / "bad.avi")
        with open(path, "wb") as f:
            f.write(b"not an avi at all")
        with pytest.raises(ValueError, match="RIFF"):
            MjpegReader(path)
        w = MjpegWriter(str(tmp_path / "w.avi"), 10, (8, 8))
        with pytest.raises(ValueError, match="shape"):
            w.write(np.zeros((9, 8, 3), np.uint8))
        w.release()
        w.release()  # idempotent

    def test_write_after_release_rejected(self, tmp_path):
        from kornia_tpu.io.mjpeg_avi import MjpegWriter

        w = MjpegWriter(str(tmp_path / "wr.avi"), 10, (8, 8))
        w.write(np.zeros((8, 8, 3), np.uint8))
        w.release()
        with pytest.raises(ValueError, match="closed"):
            w.write(np.zeros((8, 8, 3), np.uint8))

    def test_truncated_header_rejected(self, tmp_path):
        from kornia_tpu.io.mjpeg_avi import MjpegReader, MjpegWriter

        path = str(tmp_path / "full.avi")
        with MjpegWriter(path, 10, (8, 8)) as w:
            w.write(np.zeros((8, 8, 3), np.uint8))
        with open(path, "rb") as f:
            data = f.read()
        cut = str(tmp_path / "cut.avi")
        with open(cut, "wb") as f:
            f.write(data[:40])  # cut inside the avih chunk
        with pytest.raises(ValueError, match="truncated|corrupted"):
            MjpegReader(cut)

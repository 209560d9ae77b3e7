"""Build & run the C++ consumer of the native C API (kornia-cpp parity)."""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "kornia_tpu", "native")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_cpp_consumer(tmp_path):
    exe = str(tmp_path / "test_native")
    srcs = [os.path.join(NATIVE, "tests", "test_native.cpp"),
            os.path.join(NATIVE, "rvl.cpp"),
            os.path.join(NATIVE, "ccl.cpp")]
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", exe, *srcs],
        check=True, capture_output=True)
    out = subprocess.run([exe], check=True, capture_output=True, text=True)
    assert "NATIVE CPP TESTS PASSED" in out.stdout


def test_video_reader_writer_roundtrip(tmp_path):
    """Video IO smoke (kornia-io video.rs parity) — cv2-backed."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np
    from kornia_tpu.io.video import VideoReader, VideoWriter

    rng = np.random.default_rng(0)
    frames = [np.full((48, 64, 3), i * 30, np.uint8) for i in range(5)]
    path = str(tmp_path / "clip.mp4")
    with VideoWriter(path, fps=10, size_hw=(48, 64)) as w:
        for f in frames:
            w.write(f)

    with VideoReader(path) as r:
        assert r.size == (48, 64)
        got = list(r)
    assert len(got) == 5
    for orig, dec in zip(frames, got):
        assert abs(int(orig[0, 0, 0]) - int(dec[0, 0, 0])) < 12  # lossy

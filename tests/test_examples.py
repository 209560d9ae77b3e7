"""Smoke tests: every example CLI runs end-to-end on the CPU backend
(the reference treats examples as API tests — SURVEY.md §2.13)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=420):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join("examples", script), "--cpu", *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_fast_detector():
    out = _run("fast_detector.py")
    assert "corners:" in out


def test_orb_detector():
    out = _run("orb_detector.py", "--n-features", "512")
    assert "median reproj err" in out
    err = float(out.split("median reproj err")[1].split("px")[0])
    assert err < 1.5


def test_orb_tracking_live(tmp_path):
    out_html = str(tmp_path / "tracks.html")
    out = _run("orb_tracking_live.py", "--frames", "12",
               "--n-features", "400", "--viz", out_html)
    assert "tracked matches" in out and "fps" in out
    assert os.path.exists(out_html)


def test_pnp_demo():
    out = _run("pnp_demo.py")
    rot_err = float(out.split("rotation error:")[1].split("°")[0])
    assert rot_err < 1.0


def test_undistort_image():
    out = _run("undistort_image.py")
    assert "undistort" in out


def test_apriltag_pose_synthetic():
    out = _run("apriltag_pose.py", "--synthetic", "2")
    assert "id 42" in out


def test_icp_registration():
    out = _run("icp_registration.py", "--n-scans", "3")
    assert "PGO: cost" in out


def test_bag_of_words():
    out = _run("bag_of_words.py")
    # each place must retrieve itself
    for i in range(4):
        assert f"query place {i}: best {i}" in out


def test_vlm_demo():
    out = _run("vlm_demo.py", "--max-new", "4")
    assert "generated" in out


def test_preprocess_pipeline():
    out = _run("preprocess_pipeline.py", "--size", "224")
    assert "fused preprocess" in out


def test_two_view():
    out = _run("two_view.py")
    inl = int(out.split("inliers:")[1].split(",")[0])
    assert inl > 60


def test_camera_capture():
    out = _run("camera_capture.py", "--frames", "3")
    assert "corners" in out and "done" in out


def test_video_player():
    out = _run("video_player.py", "--frames", "5")
    assert "wrote 5 frames" in out

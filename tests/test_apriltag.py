"""AprilTag pipeline tests: families, render/decode round-trips,
rotation invariance, perspective warps, real-photo recall vs cv2.aruco,
and 6-DOF pose accuracy.
"""

import os

import numpy as np
import pytest

import cv2

from kornia_tpu import apriltag as at

REF_DATA = "/root/reference/tests/data"


@pytest.fixture(scope="module")
def fam36():
    return at.get_family("tag36h11")


class TestFamilies:
    def test_all_families_load(self):
        for name in at.FAMILY_NAMES:
            fam = at.get_family(name)
            assert fam.nbits == len(fam.bit_x) == len(fam.bit_y)
            assert len(fam.codes) > 0

    def test_tag36h11_shape(self, fam36):
        assert fam36.nbits == 36
        assert len(fam36.codes) == 587
        assert fam36.min_hamming == 11
        assert fam36.max_safe_hamming == 5

    def test_rotation_permutation_closes(self, fam36):
        code = int(fam36.codes[42])
        assert fam36.rotate_code(code, 4) == code

    def test_match_with_bitflips(self, fam36):
        code = int(fam36.codes[100])
        corrupted = code ^ (1 << 3) ^ (1 << 20)
        m = fam36.match(corrupted, max_hamming=2)
        assert m is not None and m[0] == 100 and m[1] == 2

    def test_match_rejects_excess_hamming(self, fam36):
        with pytest.raises(ValueError):
            fam36.match(0, max_hamming=6)  # > max_safe_hamming


class TestRender:
    def test_matches_reference_fixture(self, fam36):
        """render_tag reproduces the reference's 30×30 tag image
        byte-for-byte (tests/data/apriltag.png = tag36h11 id 23)."""
        ref = cv2.imread(os.path.join(REF_DATA, "apriltag.png"),
                         cv2.IMREAD_GRAYSCALE)
        if ref is None:
            pytest.skip("reference fixture unavailable")
        ours = at.render_tag(fam36, 23, scale=3)
        np.testing.assert_array_equal(ours, ref)


class TestDetector:
    def _canvas(self, fam, tag_id, scale=12, size=300, pos=(90, 80)):
        tag = at.render_tag(fam, tag_id, scale=scale)
        canvas = np.full((size, size), 255, np.uint8)
        canvas[pos[0]: pos[0] + tag.shape[0],
               pos[1]: pos[1] + tag.shape[1]] = tag
        return canvas

    def test_detect_roundtrip(self, fam36):
        det = at.AprilTagDecoder()
        for tag_id in (0, 23, 111, 586):
            ds = det.decode(self._canvas(fam36, tag_id))
            assert len(ds) == 1
            assert ds[0].tag_id == tag_id
            assert ds[0].hamming == 0

    def test_rotation_invariance_and_corner_tracking(self, fam36):
        det = at.AprilTagDecoder()
        canvas = self._canvas(fam36, 5)
        w = canvas.shape[1]
        c0 = det.decode(canvas)[0].corners[0]
        for k in range(1, 4):
            d = det.decode(np.rot90(canvas, k).copy())[0]
            assert d.tag_id == 5
            e = c0.copy()
            for _ in range(k):
                e = np.array([e[1], w - 1 - e[0]])
            assert np.linalg.norm(e - d.corners[0]) < 1.5

    def test_homography_anchors_corner0(self, fam36):
        det = at.AprilTagDecoder()
        d = det.decode(self._canvas(fam36, 77))[0]
        p = d.homography @ np.array([-1.0, -1.0, 1.0])
        np.testing.assert_allclose(p[:2] / p[2], d.corners[0], atol=1e-6)

    def test_perspective_warp(self, fam36):
        tag = at.render_tag(fam36, 42, scale=20)
        s = tag.shape[0]
        src = np.array([[0, 0], [s, 0], [s, s], [0, s]], np.float32)
        dst = np.array([[140, 90], [430, 120], [460, 380], [110, 350]],
                       np.float32)
        h, _ = cv2.findHomography(src, dst)
        canvas = cv2.warpPerspective(tag, h, (560, 480), borderValue=255)
        ds = at.AprilTagDecoder().decode(canvas)
        assert len(ds) == 1 and ds[0].tag_id == 42

    def test_noise_robustness(self, fam36):
        rng = np.random.default_rng(0)
        canvas = self._canvas(fam36, 9).astype(np.int16)
        noisy = np.clip(canvas + rng.normal(0, 12, canvas.shape), 0,
                        255).astype(np.uint8)
        ds = at.AprilTagDecoder().decode(noisy)
        assert len(ds) == 1 and ds[0].tag_id == 9

    def test_multiple_tags(self, fam36):
        canvas = np.full((300, 560), 255, np.uint8)
        for i, tag_id in enumerate((3, 17, 99)):
            tag = at.render_tag(fam36, tag_id, scale=10)
            canvas[100:100 + tag.shape[0],
                   30 + 180 * i: 30 + 180 * i + tag.shape[1]] = tag
        ds = at.AprilTagDecoder().decode(canvas)
        assert sorted(d.tag_id for d in ds) == [3, 17, 99]

    def test_empty_image(self):
        ds = at.AprilTagDecoder().decode(np.full((120, 120), 255, np.uint8))
        assert ds == []

    def test_real_photo_recall(self):
        """FULL recall vs cv2.aruco on the reference's real-photo
        fixture (14/14 since threshold_split=0.6 severed the white
        leaks that merged tag interiors with the background — see
        DetectorConfig.threshold_split)."""
        path = os.path.join(REF_DATA, "apriltags_tag36h11.jpg")
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            pytest.skip("reference fixture unavailable")
        dic = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
        corners, ids, _ = cv2.aruco.ArucoDetector(
            dic, cv2.aruco.DetectorParameters()).detectMarkers(img)
        n_ref = 0 if ids is None else len(ids)
        ds = at.AprilTagDecoder().decode(img)
        assert len(ds) >= n_ref, (len(ds), n_ref)
        assert all(d.tag_id == 0 for d in ds)  # the board is all id 0

    def test_real_photo_decimate2(self):
        """decimate=2 on this fixture: the tags are ~56 px across, so
        half-res leaves ~2.3 px per bit cell and the smaller tags are
        physically undecodable — 6/14 survive, with either striding or
        average-pool decimation (measured 2026-08-19; the full-recall
        default stays quad_decimate=1)."""
        path = os.path.join(REF_DATA, "apriltags_tag36h11.jpg")
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            pytest.skip("reference fixture unavailable")
        ds = at.AprilTagDecoder(at.DetectorConfig(
            families=("tag36h11",), quad_decimate=2)).decode(img)
        assert len(ds) >= 6
        assert all(d.tag_id == 0 for d in ds)

    def test_other_family(self):
        fam = at.get_family("tag16h5")
        canvas = self._canvas(fam, 11, scale=16)
        ds = at.AprilTagDecoder(at.DetectorConfig(
            families=("tag16h5",), max_hamming=0)).decode(canvas)
        assert len(ds) == 1 and ds[0].tag_id == 11


class TestPose:
    def test_synthetic_pose(self, fam36):
        k = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        th = np.deg2rad(25)
        r_true = np.array([
            [1, 0, 0],
            [0, np.cos(th), -np.sin(th)],
            [0, np.sin(th), np.cos(th)]])
        t_true = np.array([0.05, -0.03, 1.0])
        size = 0.16
        half = size / 2
        obj = np.array([[-half, -half, 0], [half, -half, 0],
                        [half, half, 0], [-half, half, 0]])
        cam = obj @ r_true.T + t_true
        px = cam @ k.T
        px = px[:, :2] / px[:, 2:]

        tag = at.render_tag(fam36, 7, scale=20)
        s = tag.shape[0]
        # black border spans 10% .. 90% of the rendered canvas
        src = np.array([[s * .1, s * .1], [s * .9, s * .1],
                        [s * .9, s * .9], [s * .1, s * .9]], np.float32)
        h, _ = cv2.findHomography(src, px.astype(np.float32))
        canvas = cv2.warpPerspective(tag, h, (640, 480), borderValue=255)

        ds = at.AprilTagDecoder().decode(canvas)
        assert len(ds) == 1 and ds[0].tag_id == 7
        pair = at.estimate_tag_pose(ds[0], k, size)
        r_err = np.rad2deg(np.arccos(np.clip(
            (np.trace(pair.best.rotation @ r_true.T) - 1) / 2, -1, 1)))
        assert r_err < 2.0
        assert np.linalg.norm(pair.best.translation - t_true) < 0.01
        assert pair.ambiguity < 0.5  # clearly disambiguated at 25° tilt

    def test_frontal_ambiguity(self, fam36):
        """Fronto-parallel tags are ambiguous: both poses similar error."""
        k = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        tag = at.render_tag(fam36, 3, scale=12)
        canvas = np.full((480, 640), 255, np.uint8)
        canvas[180: 180 + tag.shape[0], 260: 260 + tag.shape[1]] = tag
        ds = at.AprilTagDecoder().decode(canvas)
        pair = at.estimate_tag_pose(ds[0], k, 0.1)
        assert pair.best.translation[2] > 0
        assert pair.alternate.translation[2] > 0


class TestStageParityVsCFixtures:
    """Stage-level parity against the C apriltag library's committed
    intermediate dumps (reference kornia-apriltag/tests/parity.rs
    methodology; fixtures tests/data/apriltag_gradient_clusters.txt,
    generated by the C library on tests/data/apriltag.png)."""

    def _gray(self):
        from PIL import Image as PILImage

        path = os.path.join(REF_DATA, "apriltag.png")
        if not os.path.exists(path):
            pytest.skip("reference apriltag.png not available")
        return np.asarray(PILImage.open(path).convert("L"))

    def _fixture_clusters(self):
        import re

        path = os.path.join(REF_DATA, "apriltag_gradient_clusters.txt")
        if not os.path.exists(path):
            pytest.skip("reference gradient-cluster fixture not available")
        clusters = []
        for line in open(path):
            pts = re.findall(r"\(x=(-?\d+) y=(-?\d+) gx=(-?\d+) gy=(-?\d+)\)",
                             line)
            if pts:
                clusters.append({(int(x), int(y)) for x, y, _, _ in pts})
        return clusters

    def _my_clusters(self, gray):
        import jax.numpy as jnp

        from kornia_tpu.apriltag import threshold as thr_mod
        from kornia_tpu.apriltag.detector import _boundary_points
        from kornia_tpu.ops.connected_components import label_classes_host

        threshim = np.asarray(thr_mod.adaptive_threshold(
            jnp.asarray(gray), 4, 20))
        labels = label_classes_host(threshim, skip=thr_mod.UNKNOWN)
        keys, x2, y2 = _boundary_points(threshim, labels)
        out = {}
        for k in np.unique(keys):
            m = keys == k
            out[int(k)] = {(int(x), int(y))
                           for x, y in zip(x2[m], y2[m])}
        return out

    def test_gradient_cluster_pixel_sets_match_c(self):
        """Every C cluster (the doubled-coordinate black/white boundary
        sets) must be reproduced by one of our (black,white)-keyed
        clusters with IoU ≥ 0.9 — pins threshold + CCL + boundary
        clustering in one shot."""
        gray = self._gray()
        want = self._fixture_clusters()
        assert len(want) >= 2
        mine = list(self._my_clusters(gray).values())
        for i, c_set in enumerate(want):
            best = max(
                (len(c_set & m) / len(c_set | m) for m in mine),
                default=0.0)
            assert best >= 0.9, (i, len(c_set), best)

    def test_quad_corners_match_c(self):
        """fit_quads on apriltag.png: the C-library-pinned corners
        [[27,3],[27,27],[3,27],[3,3]] ±1 px (reference quad.rs
        test_fit_quads)."""
        gray = self._gray()
        os.environ["KORNIA_TPU_APRILTAG_MID"] = "numpy"
        try:
            dec = at.AprilTagDecoder(at.DetectorConfig(
                families=("tag36h11",), quad_decimate=1))
            dets = dec.decode(gray)
        finally:
            os.environ.pop("KORNIA_TPU_APRILTAG_MID", None)
        assert len(dets) == 1
        got = {(round(float(x)), round(float(y)))
               for x, y in dets[0].corners}
        want = {(27, 3), (27, 27), (3, 27), (3, 3)}
        for wx, wy in want:
            assert any(abs(gx - wx) <= 1 and abs(gy - wy) <= 1
                       for gx, gy in got), (got, (wx, wy))

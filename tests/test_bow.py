"""Bag-of-words tests: vocabulary build/transform, scores, database,
ORBvoc.txt import, save/load, and a place-recognition e2e over ORB."""

import numpy as np
import pytest

from kornia_tpu import bow


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(3)


@pytest.fixture(scope="module")
def train_desc(rng):
    """Clustered synthetic 256-bit descriptors: 8 ground-truth clusters."""
    bases = rng.integers(0, 256, (8, 32), np.uint8)
    out = []
    for b in bases:
        bits = np.unpackbits(np.tile(b, (60, 1)), axis=1)
        flips = rng.random(bits.shape) < 0.04
        out.append(np.packbits(bits ^ flips, axis=1))
    return np.concatenate(out)


@pytest.fixture(scope="module")
def vocab(train_desc):
    return bow.Vocabulary.build(train_desc, k=4, depth=3, seed=0)


class TestVocabulary:
    def test_build_shapes(self, vocab):
        assert vocab.n_words > 4
        assert vocab.children.shape[1] == 4
        assert (vocab.word_id >= 0).sum() == vocab.n_words

    def test_transform_deterministic(self, vocab, train_desc):
        w1, _ = vocab.transform_words(train_desc[:50])
        w2, _ = vocab.transform_words(train_desc[:50])
        np.testing.assert_array_equal(w1, w2)

    def test_similar_descriptors_share_words(self, vocab, rng, train_desc):
        """A descriptor and a 2-bit-flipped copy should usually quantize
        to the same word."""
        desc = train_desc[::10]
        bits = np.unpackbits(desc, axis=1)
        flip_idx = rng.integers(0, 256, (len(desc), 2))
        for i, (a, b) in enumerate(flip_idx):
            bits[i, a] ^= 1
            bits[i, b] ^= 1
        noisy = np.packbits(bits, axis=1)
        w0, _ = vocab.transform_words(desc)
        w1, _ = vocab.transform_words(noisy)
        assert (w0 == w1).mean() > 0.7

    def test_empty_input(self, vocab):
        words, weights = vocab.transform_words(np.empty((0, 32), np.uint8))
        assert words.size == 0 and weights.size == 0
        assert vocab.transform(np.empty((0, 32), np.uint8)) == {}

    def test_bow_vector_normalized(self, vocab, train_desc):
        vec = vocab.transform(train_desc[:40])
        assert abs(sum(vec.values()) - 1.0) < 1e-6

    def test_save_load_roundtrip(self, vocab, train_desc, tmp_path):
        p = str(tmp_path / "vocab.npz")
        vocab.save(p)
        v2 = bow.Vocabulary.load(p)
        w1, _ = vocab.transform_words(train_desc[:30])
        w2, _ = v2.transform_words(train_desc[:30])
        np.testing.assert_array_equal(w1, w2)

    def test_direct_index(self, vocab, train_desc):
        vec, direct = vocab.transform_with_direct_index(train_desc[:20])
        covered = np.concatenate(list(direct.values()))
        assert sorted(covered.tolist()) == list(range(20))
        assert set(direct) == set(vec)


class TestOrbvocImport:
    def test_text_format(self, tmp_path, rng):
        """Round-trip a tiny synthetic DBoW2-text vocabulary."""
        k, depth = 2, 1
        lines = [f"{k} {depth} 0 0"]
        descs = rng.integers(0, 256, (2, 32))
        for d in descs:
            lines.append("0 1 " + " ".join(str(v) for v in d) + " 0.5")
        p = tmp_path / "ORBvoc.txt"
        p.write_text("\n".join(lines) + "\n")
        v = bow.Vocabulary.from_orbvoc_txt(str(p))
        assert v.n_words == 2
        words, wts = v.transform_words(descs.astype(np.uint8))
        assert words[0] != words[1]
        assert np.all(wts == 0.5)


class TestScores:
    def test_identity_scores(self):
        a = {1: 0.5, 2: 0.3, 7: 0.2}
        assert bow.score_l1(a, a) == pytest.approx(1.0)
        assert bow.score_l2(a, a) == pytest.approx(1.0)
        assert bow.score_kl(a, a) == pytest.approx(0.0, abs=1e-9)
        assert bow.score_bhattacharyya(a, a) == pytest.approx(1.0)
        assert bow.score_chi_square(a, a) == pytest.approx(1.0)

    def test_disjoint_scores(self):
        a = {1: 1.0}
        b = {2: 1.0}
        assert bow.score_l1(a, b) == pytest.approx(0.0)
        assert bow.score_l2(a, b) == pytest.approx(0.0)
        assert bow.score_dot(a, b) == 0.0
        assert bow.score_kl(a, b) > 10  # strongly divergent

    def test_ordering(self):
        a = {1: 0.5, 2: 0.5}
        near = {1: 0.45, 2: 0.45, 3: 0.1}
        far = {1: 0.1, 4: 0.9}
        for name in ("l1", "l2", "dot", "chi_square", "bhattacharyya"):
            fn = bow.SCORES[name]
            assert fn(a, near) > fn(a, far), name
        assert bow.score_kl(a, near) < bow.score_kl(a, far)


class TestDatabase:
    def test_query_ranks_self_first(self, vocab, train_desc, rng):
        db = bow.BowDatabase(vocab)
        images = [train_desc[i * 60:(i + 1) * 60] for i in range(8)]
        for im in images:
            db.add(im)
        assert len(db) == 8
        # query with a noisy version of image 3
        bits = np.unpackbits(images[3], axis=1)
        noisy = np.packbits(bits ^ (rng.random(bits.shape) < 0.02), axis=1)
        res = db.query(noisy, top_k=3)
        assert res[0].entry_id == 3

    def test_query_exclude(self, vocab, train_desc):
        db = bow.BowDatabase(vocab)
        for i in range(4):
            db.add(train_desc[i * 60:(i + 1) * 60])
        res = db.query(train_desc[0:60], top_k=4, exclude=(0,))
        assert all(r.entry_id != 0 for r in res)

    def test_direct_index_matching(self, vocab, train_desc, rng):
        db = bow.BowDatabase(vocab)
        a = train_desc[0:60]
        # b = shuffled copy of a with tiny noise — matches must invert
        perm = rng.permutation(60)
        b = a[perm]
        ia = db.add(a)
        ib = db.add(b)
        pairs = db.match_via_direct_index(ia, ib, a, b, max_distance=16)
        assert len(pairs) >= 40
        correct = (perm[pairs[:, 1]] == pairs[:, 0]).mean()
        assert correct > 0.9


class TestPlaceRecognitionE2E:
    def test_orb_frames(self, rng):
        """End-to-end: ORB descriptors from distinct synthetic scenes;
        a re-visit must retrieve the right scene."""
        import jax.numpy as jnp
        import cv2
        from kornia_tpu.features import orb

        cfg = orb.OrbConfig(n_features=256, n_levels=3)
        frames = []
        for _ in range(4):
            small = (rng.random((30, 40)) * 255).astype(np.uint8)
            frames.append(cv2.resize(small, (320, 240),
                                     interpolation=cv2.INTER_NEAREST))

        feats = [orb.orb_detect_and_describe(jnp.asarray(f), cfg)
                 for f in frames]
        descs = []
        for ft in feats:
            mask = np.asarray(ft.mask)
            bits = np.asarray(ft.descriptors)[mask].astype(np.uint8)
            descs.append(np.packbits(bits, axis=1))  # (n, 32) bytes

        vocab = bow.Vocabulary.build(np.concatenate(descs), k=6, depth=3)
        db = bow.BowDatabase(vocab)
        for d in descs:
            db.add(d)

        # revisit scene 2 with a small shift
        shifted = np.roll(frames[2], 4, axis=1)
        ft = orb.orb_detect_and_describe(jnp.asarray(shifted), cfg)
        q = np.packbits(
            np.asarray(ft.descriptors)[np.asarray(ft.mask)].astype(np.uint8),
            axis=1)
        res = db.query(q, top_k=2)
        assert res[0].entry_id == 2
        assert res[0].score > res[1].score + 0.05

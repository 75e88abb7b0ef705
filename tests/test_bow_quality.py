"""BoW retrieval quality: trained Hamming k-majority codebook vs random codes
(VERDICT r2 missing #2 / do #4).

The committed ``data/vocab.npz`` is trained by ``scripts/train_vocab.py`` on
descriptors harvested from scenes DISJOINT from the evaluation scenes here
(training seeds 1+13k, eval seeds 1000+7k)."""

import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models.frame import FrameBuilder
from orb_slam_free_space_carving_tpu.ops import bow
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence


@pytest.fixture(scope="module")
def eval_vectors():
    cfg = SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
    )
    builder = FrameBuilder(cfg)
    feats = []
    for scene in range(4):
        seq = SyntheticSequence(cfg.camera, n_frames=4, seed=1000 + scene * 7)
        for i in (0, 1):                     # two nearby views per scene
            _, img = seq.frame(i)
            f = builder(img).feat
            feats.append((f.desc, f.valid))
    return feats


def _margins(codebook_u8, feats):
    cb = jnp.asarray(codebook_u8)
    vecs = [np.asarray(bow.bow_vector(d, v, cb, n_words=codebook_u8.shape[0]))
            for d, v in feats]
    n = len(vecs) // 2
    same, diff = [], []
    for a in range(n):
        va, vb = vecs[2 * a], vecs[2 * a + 1]
        same.append(np.minimum(va, vb).sum())
        for b in range(n):
            if b != a:
                diff.append(np.minimum(va, vecs[2 * b]).sum())
    return float(np.mean(same)), float(np.mean(diff))


def test_trained_vocab_exists_and_loads():
    cb = bow.codebook(4096, 7)
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)
    assert not np.array_equal(cb, rand), \
        "data/vocab.npz missing: codebook() fell back to random codes"


def test_trained_beats_random_margin(eval_vectors):
    """Same-place-minus-different-place score margin improves with training."""
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)
    s_r, d_r = _margins(rand, eval_vectors)
    trained = bow.codebook(4096, 7)
    s_t, d_t = _margins(trained, eval_vectors)
    assert (s_t - d_t) > (s_r - d_r) * 1.3, (
        f"trained margin {s_t - d_t:.4f} vs random {s_r - d_r:.4f}")


def test_trained_ranking_correct(eval_vectors):
    """Every query's same-place partner outranks all different-place views."""
    trained = bow.codebook(4096, 7)
    cb = jnp.asarray(trained)
    vecs = [np.asarray(bow.bow_vector(d, v, cb, n_words=4096))
            for d, v in eval_vectors]
    n = len(vecs) // 2
    for a in range(n):
        va, vb = vecs[2 * a], vecs[2 * a + 1]
        same = np.minimum(va, vb).sum()
        for b in range(n):
            if b != a:
                assert same > np.minimum(va, vecs[2 * b]).sum()


def test_loop_recall_at_scale():
    """Recall@K gate on a 2-lap circuit with ground-truth revisits under
    viewpoint offset + photometric degradation + distractor keyframes from
    confusable scenes (VERDICT r4 #4; the full 512-frame curve artifact is
    scripts/eval_bow_recall.py -> BOW_RECALL.json).  Uses the production
    65536-word tree vocabulary with tf-idf scoring."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from eval_bow_recall import recall_curve_vectors, tree_vectors, two_lap_views

    from orb_slam_free_space_carving_tpu.config import LoopConfig

    feats, laps, angle = two_lap_views(256, 8)
    vocab = bow.get_vocabulary(LoopConfig())
    curve, n_q = recall_curve_vectors(
        tree_vectors(vocab, feats), laps, angle, 8)
    assert n_q >= 15
    assert curve["recall@1"] >= 0.8, curve
    # 16 queries -> granularity 1/16; >=0.9 means at most one miss in top-5.
    assert curve["recall@5"] >= 0.9, curve


# ---------------------------------------------------------------------------
# Hierarchical tree vocabulary (VERDICT r4 #4)
# ---------------------------------------------------------------------------

def test_tree_vocab_descent_and_sparse_scoring():
    """Descent determinism, self-similarity, and sparse-vs-dense agreement."""
    from orb_slam_free_space_carving_tpu.config import LoopConfig

    vocab = bow.get_vocabulary(LoopConfig())
    assert vocab.n_words == 65536 and vocab.levels == 4
    rng = np.random.default_rng(3)
    d = rng.integers(0, 256, (256, 32), dtype=np.uint8)
    valid = np.ones(256, bool)
    w1, c1 = vocab.words_nodes(jnp.asarray(d), jnp.asarray(valid))
    w2, c2 = vocab.words_nodes(jnp.asarray(d), jnp.asarray(valid))
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.asarray(w1).min() >= 0
    assert np.asarray(c1).max() < vocab.branch ** 2  # coarse layer bound

    ext, ws, wt = bow.tree_bow_sparse(
        jnp.asarray(d), jnp.asarray(valid), vocab.tv, vocab.levels,
        vocab.n_words, 256)
    # Sparse row reproduces the dense vector's support exactly.
    dense = np.asarray(ext)[:vocab.n_words]
    ws_np, wt_np = np.asarray(ws), np.asarray(wt)
    live = wt_np > 0
    assert np.allclose(np.sort(dense[dense > 0])[::-1], np.sort(wt_np[live])[::-1])
    # Self L1 score = 1 (normalized), disjoint row scores 0.
    s = bow.sparse_l1_scores(ext, ws[None, :], wt[None, :],
                             jnp.asarray([True]))
    assert abs(float(s[0]) - 1.0) < 1e-5


def test_dbow2_text_import_roundtrip(tmp_path):
    """save_dbow2_text -> load_dbow2_text: co-assignment-consistent words,
    idf carried through the weight column, ragged-tree descent safe."""
    rng = np.random.default_rng(5)
    desc = rng.integers(0, 256, (2000, 32), dtype=np.uint8)
    levels = bow.train_tree_vocab(desc, branch=4, levels=3, iterations=4,
                                  seed=1)
    idf = rng.uniform(0.5, 2.0, 4 ** 3).astype(np.float32)
    path = str(tmp_path / "voc.txt")
    bow.save_dbow2_text(path, levels, 4, word_idf=idf)
    tv_imp, L, n_words = bow.load_dbow2_text(path)
    assert L == 3 and n_words == 64
    tv_dir = bow.tree_from_levels(levels, 4, word_idf=idf)
    sample = jnp.asarray(desc[:512])
    v = jnp.ones(512, bool)
    w1, _ = bow.tree_words_nodes(sample, v, tv_dir, 3)
    w2, _ = bow.tree_words_nodes(sample, v, tv_imp, L)
    w1, w2 = np.asarray(w1), np.asarray(w2)
    # Same partition of descriptors (word ids may be permuted).
    key = w1.astype(np.int64) * 1000 + w2
    assert len(np.unique(key)) == len(np.unique(w1)) == len(np.unique(w2))
    # idf round trip: the imported per-word weights match up to permutation.
    imp_idf = np.asarray(tv_imp.word_idf)[:n_words]
    assert np.allclose(np.sort(imp_idf), np.sort(idf), atol=1e-5)

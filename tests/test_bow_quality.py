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
    viewpoint offset + photometric degradation (VERDICT r3 do #9; the full
    512-frame curve artifact is scripts/eval_bow_recall.py ->
    BOW_RECALL.json)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from eval_bow_recall import recall_curve, two_lap_views

    feats, laps, angle = two_lap_views(256, 8)
    trained = bow.codebook(4096, 7)
    curve, n_q = recall_curve(trained, feats, laps, angle, 8)
    assert n_q >= 15
    assert curve["recall@1"] >= 0.9, curve
    assert curve["recall@5"] >= 0.95, curve

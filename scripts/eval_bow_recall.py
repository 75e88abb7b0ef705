"""BoW loop-recall evaluation on a long circuit with ground-truth revisits.

VERDICT r3 #9 / r4 #4: prove place recognition under REAL discriminative
pressure.  A TWO-LAP circuit in the closed textured room gives every
second-lap view a known first-lap revisit partner; recall@K asks whether the
partner (within +-tol keyframe steps) appears in the top-K BoW matches.  The
database additionally holds DISTRACTOR keyframes from other scenes with the
same texture statistics, lap 2 walks a different radius under heavy sensor
degradation (noise, exposure drift, blur, vignette), and the tolerance is one
keyframe step — an eval where random quantization must fail (<0.5 recall@1)
for trained recall to mean anything.  Reference analog: DBoW2 retrieval
feeding DetectLoop / Relocalization (``KeyFrameDatabase.cc:76-309``).

Writes BOW_RECALL.json for the trained tree (65536), trained flat 4096, and
a random-code baseline.

Run: python scripts/eval_bow_recall.py [n_frames] [kf_every]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/osfsc_jax_cache_cpu")

import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, LoopConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models.frame import FrameBuilder
from orb_slam_free_space_carving_tpu.ops import bow
from orb_slam_free_space_carving_tpu.utils.synthetic import (
    SyntheticSequence, circuit_trajectory, make_closed_room_scene,
)

N_DISTRACTORS = 512


def _cfg():
    return SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
    )


def two_lap_views(n_frames: int, kf_every: int):
    """Keyframe descriptor sets of a 2-lap circuit + distractors.

    Lap 2 walks a DIFFERENT radius (viewpoint offset ~25 cm) under sensor
    noise / exposure drift / motion blur; distractor keyframes come from
    other scenes with the same texture generator — the confusable negatives
    a real database accumulates."""
    from orb_slam_free_space_carving_tpu.utils.synthetic import Degrade

    cfg = _cfg()
    lap1 = circuit_trajectory(n_frames // 2, radius=0.7)
    lap2 = circuit_trajectory(n_frames // 2, radius=0.95)
    seq = SyntheticSequence(
        cfg.camera, n_frames=n_frames, scene=make_closed_room_scene(),
        poses_cw=lap1 + lap2,
        degrade=Degrade(noise_sigma=8.0, exposure_amp=0.4, blur_px=2,
                        vignette=0.3),
    )
    builder = FrameBuilder(cfg)
    feats, laps, angle = [], [], []
    for i in range(0, n_frames, kf_every):
        _, img = seq.frame(i)
        f = builder(img).feat
        feats.append((f.desc, f.valid))
        laps.append(0 if i < n_frames // 2 else 1)
        angle.append(i % (n_frames // 2))
    # Distractors: circuit views of OTHER closed rooms built by the same
    # texture generator (maximally confusable negatives), inserted as lap-0
    # database rows with an angle that can never match.
    per_scene = 16
    for s in range(N_DISTRACTORS // per_scene):
        dscene = make_closed_room_scene(seed=100 + s * 7)
        dposes = circuit_trajectory(per_scene * 3, radius=0.7)
        dseq = SyntheticSequence(cfg.camera, n_frames=per_scene * 3,
                                 scene=dscene, poses_cw=dposes)
        for i in range(0, per_scene * 3, 3):
            _, img = dseq.frame(i)
            f = builder(img).feat
            feats.append((f.desc, f.valid))
            laps.append(0)
            angle.append(-10**6)
    return feats, np.asarray(laps), np.asarray(angle)


def recall_curve_vectors(vecs, laps, angle, kf_every, ks=(1, 2, 5, 10),
                         tol_steps=1):
    db = vecs[laps == 0]
    db_angle = angle[laps == 0]
    out = {k: 0 for k in ks}
    n_q = 0
    for qi in np.where(laps == 1)[0]:
        q = vecs[qi]
        scores = np.minimum(q[None, :], db).sum(axis=1)
        order = np.argsort(-scores)
        good = np.abs(db_angle - angle[qi]) <= tol_steps * kf_every
        n_q += 1
        for k in ks:
            if good[order[:k]].any():
                out[k] += 1
    return {f"recall@{k}": round(out[k] / max(n_q, 1), 4) for k in ks}, n_q


def flat_vectors(codebook_u8, feats):
    cb = jnp.asarray(codebook_u8)
    W = codebook_u8.shape[0]
    return np.stack([
        np.asarray(bow.bow_vector(d, v, cb, n_words=W)) for d, v in feats
    ])


def tree_vectors(vocab, feats):
    return np.stack([
        np.asarray(vocab.bow_vector(d, v)) for d, v in feats
    ])


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    kf_every = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    feats, laps, angle = two_lap_views(n_frames, kf_every)
    n_kf = len(feats)

    res = {"n_frames": n_frames, "n_keyframes": n_kf, "kf_every": kf_every,
           "n_distractors": N_DISTRACTORS, "tol_steps": 1}

    vocab = bow.get_vocabulary(LoopConfig())
    curve, n_q = recall_curve_vectors(
        tree_vectors(vocab, feats), laps, angle, kf_every)
    res[f"tree_{vocab.n_words}"] = curve
    res["n_queries"] = n_q
    print(f"tree_{vocab.n_words}", curve, flush=True)

    trained = bow.codebook(4096, 7)
    curve, _ = recall_curve_vectors(
        flat_vectors(trained, feats), laps, angle, kf_every)
    res["trained_4096"] = curve
    print("trained_4096", curve, flush=True)

    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)
    curve, _ = recall_curve_vectors(
        flat_vectors(rand, feats), laps, angle, kf_every)
    res["random_4096"] = curve
    print("random_4096", curve, flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BOW_RECALL.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

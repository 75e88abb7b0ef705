"""BoW loop-recall evaluation on a long circuit with ground-truth revisits.

VERDICT r3 do #9: prove place recognition at scale, not just a 4-scene
margin.  A TWO-LAP circuit in the closed textured room gives every
second-lap view a known first-lap revisit partner; recall@K asks whether
the partner (within +-tol keyframe steps) appears in the top-K BoW matches
among all first-lap keyframes.  Reference analog: DBoW2 retrieval quality
feeding DetectLoop / Relocalization candidates
(``KeyFrameDatabase.cc:76-309``).

Writes BOW_RECALL.json {vocab: {k: recall}} for the trained codebook and a
random-code baseline.

Run: python scripts/eval_bow_recall.py [n_frames] [kf_every]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models.frame import FrameBuilder
from orb_slam_free_space_carving_tpu.ops import bow
from orb_slam_free_space_carving_tpu.utils.synthetic import (
    SyntheticSequence, circuit_trajectory, make_closed_room_scene,
)


def two_lap_views(n_frames: int, kf_every: int, width=320, height=240):
    """Keyframe images of a 2-lap circuit; returns (descs, lap, angle_idx).

    Lap 2 walks a DIFFERENT radius (viewpoint offset ~14 cm) under sensor
    noise / exposure drift / motion blur (utils.synthetic.Degrade) — a
    revisit never reproduces the original pixels, as in a real loop."""
    from orb_slam_free_space_carving_tpu.utils.synthetic import Degrade

    cfg = SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=width, height=height),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
    )
    lap1 = circuit_trajectory(n_frames // 2, radius=0.7)
    lap2 = circuit_trajectory(n_frames // 2, radius=0.84)
    seq = SyntheticSequence(
        cfg.camera, n_frames=n_frames, scene=make_closed_room_scene(),
        poses_cw=lap1 + lap2,
        degrade=Degrade(noise_sigma=4.0, exposure_amp=0.25, blur_px=1,
                        vignette=0.15),
    )
    builder = FrameBuilder(cfg)
    feats, laps, angle = [], [], []
    for i in range(0, n_frames, kf_every):
        _, img = seq.frame(i)
        f = builder(img).feat
        feats.append((f.desc, f.valid))
        laps.append(0 if i < n_frames // 2 else 1)
        angle.append(i % (n_frames // 2))
    return feats, np.asarray(laps), np.asarray(angle)


def recall_curve(codebook_u8, feats, laps, angle, kf_every,
                 ks=(1, 2, 5, 10), tol_steps=2):
    cb = jnp.asarray(codebook_u8)
    W = codebook_u8.shape[0]
    vecs = np.stack([
        np.asarray(bow.bow_vector(d, v, cb, n_words=W)) for d, v in feats
    ])
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


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    kf_every = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    feats, laps, angle = two_lap_views(n_frames, kf_every)
    n_kf = len(feats)

    trained = bow.codebook(4096, 7)
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)

    res = {"n_frames": n_frames, "n_keyframes": n_kf, "kf_every": kf_every}
    for name, cb in (("trained_4096", trained), ("random_4096", rand)):
        curve, n_q = recall_curve(cb, feats, laps, angle, kf_every)
        res[name] = curve
        res["n_queries"] = n_q
        print(name, curve)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BOW_RECALL.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

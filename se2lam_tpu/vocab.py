"""Batched bag-of-binary-words for loop-closure detection.

TPU-native re-derivation of the vendored DBoW2 stack (SURVEY §2 row 21,
Thirdparty/DBoW2): hierarchical vocabulary tree + per-node CPU popcount
descent + sparse BowVector scoring. On TPU the tree is pointless — it
exists only to cut CPU popcounts — so the vocabulary is a FLAT word bank:

- quantization = one (N, 256) x (256, W) ±1 matmul + argmin   (MXU)
- BowVector    = dense (W,) tf-idf histogram, L1-normalized
- score(a, b)  = DBoW2 L1 similarity 1 − ½·Σ|a−b|
                 (ScoringObject.h:76-98) — evaluated against the WHOLE
                 keyframe bank in one (K, W) x (W,) product

The vocabulary is trained by binary k-means (sign-of-mean = the
bitwise-majority medoid, the same statistic DBoW2's FORB::meanValue
computes) on descriptors sampled from the live map — replacing the
reference's 45MB pre-trained file (loadFromBinaryFile,
TemplatedVocabulary.h:1478) with a self-contained procedure.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Vocabulary", "train_vocab", "bow_transform", "bow_score"]


class Vocabulary(NamedTuple):
    words: jnp.ndarray    # (W, 256) ±1 int8 word centers
    idf: jnp.ndarray      # (W,) inverse-document-frequency weights

    @property
    def n_words(self):
        return self.words.shape[0]


def _assign(desc_pm1, words):
    """Nearest word per descriptor: one MXU matmul + argmax."""
    dot = jax.lax.dot_general(
        desc_pm1.astype(jnp.bfloat16),
        words.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, W); Hamming = (256 - dot)/2 so max dot = min distance
    return jnp.argmax(dot, axis=1)


@partial(jax.jit, static_argnames=("n_words", "iters"))
def train_vocab(
    desc_pm1,            # (D, 256) ±1 int8 training descriptors
    valid,               # (D,) bool
    n_words: int = 1024,
    iters: int = 8,
    key=None,
):
    """Binary k-means: Lloyd iterations with bitwise-majority centroids."""
    D = desc_pm1.shape[0]
    key = jax.random.PRNGKey(0) if key is None else key
    # init: random valid descriptors as seeds
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    seed_idx = jax.random.choice(
        key, D, shape=(n_words,), replace=True, p=probs
    )
    words = desc_pm1[seed_idx]

    def lloyd(_, words):
        a = _assign(desc_pm1, words)
        # per-word mean of ±1 bits → sign = majority vote
        sums = jnp.zeros((n_words, 256), jnp.float32).at[a].add(
            desc_pm1.astype(jnp.float32) * valid[:, None]
        )
        counts = jnp.zeros((n_words,), jnp.float32).at[a].add(
            valid.astype(jnp.float32)
        )
        new = jnp.where(sums >= 0, 1, -1).astype(jnp.int8)
        # keep seed for empty words
        return jnp.where((counts > 0)[:, None], new, words)

    words = jax.lax.fori_loop(0, iters, lloyd, words)

    # idf from the training set (TemplatedVocabulary::create TF_IDF path)
    a = _assign(desc_pm1, words)
    df = jnp.zeros((n_words,), jnp.float32).at[a].add(valid.astype(jnp.float32))
    n_docs = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    idf = jnp.log(n_docs / jnp.maximum(df, 1.0) + 1.0)
    return Vocabulary(words=words, idf=idf)


@jax.jit
def bow_transform(vocab: Vocabulary, desc_pm1, valid):
    """(N, 256) descriptors → L1-normalized tf-idf BowVector (W,).

    Also returns the word id per descriptor (the FeatureVector analog,
    used by SearchByBoW-style matching)."""
    a = _assign(desc_pm1, vocab.words)
    W = vocab.n_words
    tf = jnp.zeros((W,), jnp.float32).at[a].add(valid.astype(jnp.float32))
    v = tf * vocab.idf
    v = v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-12)
    return v, jnp.where(valid, a, -1)


@jax.jit
def bow_score(bank, v):
    """DBoW2 L1 score of ``v`` vs every row of ``bank`` (K, W):
    s = 1 − ½ Σ|a − b| = ½ Σ (|a| + |b| − |a − b|)  (ScoringObject.h:76)."""
    diff = jnp.abs(bank - v[None, :])
    return 1.0 - 0.5 * jnp.sum(diff, axis=1)

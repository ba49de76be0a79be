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

__all__ = [
    "Vocabulary", "train_vocab", "bow_transform", "bow_score",
    "document_idf",
]


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


def document_idf(word_ids, valid, doc_ids, n_docs_cap: int, n_words: int):
    """DBoW2 idf: per-DOCUMENT word frequency, weight = ln(N/Ni) where N
    is the number of documents (images) and Ni the number of documents
    containing word i; unused words weigh 0
    (TemplatedVocabulary::setNodeWeights, the TF_IDF path,
    Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — each image counts a
    word at most once via the `counted` array)."""
    ok = valid & (doc_ids >= 0)
    occ = jnp.zeros((n_docs_cap, n_words), bool).at[
        jnp.where(ok, doc_ids, n_docs_cap), word_ids
    ].max(True, mode="drop")
    df = jnp.sum(occ, axis=0).astype(jnp.float32)
    n_docs = jnp.maximum(
        jnp.sum(jnp.any(occ, axis=1)).astype(jnp.float32), 1.0
    )
    idf = jnp.where(df > 0, jnp.log(n_docs / jnp.maximum(df, 1.0)), 0.0)
    # degenerate corpus (every used word appears in every document —
    # e.g. a 2-keyframe bootstrap of one scene): all idf would be 0 and
    # every BowVector would collapse to zero; fall back to DBoW2's TF
    # weighting ("idf part must be 1 always", setNodeWeights)
    return jnp.where(
        jnp.max(idf) > 0.0, idf, (df > 0).astype(jnp.float32)
    )


@partial(jax.jit, static_argnames=("n_words", "iters", "n_docs_cap"))
def train_vocab(
    desc_pm1,            # (D, 256) ±1 int8 training descriptors
    valid,               # (D,) bool
    n_words: int = 1024,
    iters: int = 8,
    key=None,
    doc_ids=None,        # (D,) int32 document (keyframe) per descriptor
    n_docs_cap: int | None = None,
):
    """Binary k-means: Lloyd iterations with bitwise-majority centroids.

    With ``doc_ids`` (and static ``n_docs_cap``), idf follows DBoW2's
    per-document statistic; without, each descriptor counts as its own
    document (a degenerate corpus — fine for unit fixtures, wrong for
    loop-closure calibration)."""
    D = desc_pm1.shape[0]
    if doc_ids is not None and n_docs_cap is None:
        raise ValueError(
            "train_vocab: doc_ids requires a static n_docs_cap (an upper "
            "bound on the number of documents) for the idf scatter shape"
        )
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

    a = _assign(desc_pm1, words)
    if doc_ids is None:
        doc_ids = jnp.arange(D, dtype=jnp.int32)
        n_docs_cap = D
    idf = document_idf(a, valid, doc_ids, n_docs_cap, n_words)
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
    s = 1 − ½ Σ|a − b| = ½ Σ (|a| + |b| − |a − b|)  (ScoringObject.h:76).

    All-zero bank rows (empty/pruned/padded keyframes) score −inf: the
    raw formula gives them 0.5 against ANY normalized query — higher
    than real non-matches — so an unmasked empty row would win every
    detection (DBoW2 never scores an empty document)."""
    diff = jnp.abs(bank - v[None, :])
    s = 1.0 - 0.5 * jnp.sum(diff, axis=1)
    nz = jnp.any(bank != 0.0, axis=1)
    # the same argument applies to the QUERY side: an all-zero query (a
    # frame with no valid descriptors) scores 0.5 against every nonzero
    # row — above every detection gate — so it must match nothing
    nz = nz & jnp.any(v != 0.0)
    return jnp.where(nz, s, -jnp.inf)

"""Flat-vocabulary scale ceiling: BoW score separation vs map size.

DBoW2's discriminative power comes from ~1M leaf words; this framework
replaces the tree with a self-trained FLAT word bank (vocab.py) whose
default is W=1024. As the keyframe count K grows, hundreds of KFs share
words and the L1 scores compress — this study measures whether the
true-revisit vs best-impostor score separation survives, as a function
of K and W (r3 VERDICT weak #5).

Model: a corridor of landmarks (world pool of random 256-bit
descriptors); KF k observes a window of the pool (stride < window →
neighbor KFs share landmarks, like covisibility). A revisit query
re-observes place q's window with per-bit flip noise p=0.08 (≈20/256
bits, the typical same-point ORB distance across views). The vocabulary
is trained on the bank with document idf, exactly as the live system
trains (LoopCloser._ensure_vocab).

Reported per (K, W): top-1 retrieval accuracy over queries, mean/min
separation (true score − best impostor), and the detection threshold
margin (best impostor vs gm_dcl_min_score_best=0.005 — an impostor
ABOVE threshold is only a problem if it also beats the true score; the
verification stage gates the rest).

Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/study_vocab_scale.py --out artifacts/vocab_scale_r4
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(K, W, F=128, stride=64, flip=0.08, n_queries=24, seed=0):
    import jax
    import jax.numpy as jnp

    from se2lam_tpu.vocab import bow_score, bow_transform, train_vocab

    rng = np.random.default_rng(seed)
    L = stride * (K - 1) + F
    pool = (1 - 2 * rng.integers(0, 2, (L, 256))).astype(np.int8)

    def view(q, noisy):
        d = pool[q * stride:q * stride + F].copy()
        if noisy:
            flips = rng.random((F, 256)) < flip
            d = np.where(flips, -d, d)
        return jnp.asarray(d)

    bank_desc = jnp.stack([view(k, noisy=True) for k in range(K)])
    valid = jnp.ones((K, F), bool)
    doc_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
    vocab = train_vocab(
        bank_desc.reshape(-1, 256), valid.reshape(-1),
        n_words=W, iters=5, doc_ids=doc_ids, n_docs_cap=K,
        key=jax.random.PRNGKey(seed),
    )
    bank, _ = jax.vmap(
        lambda d, m: bow_transform(vocab, d, m)
    )(bank_desc, valid)

    seps, top1, best_imp = [], 0, []
    qs = rng.choice(np.arange(2, K - 2), size=min(n_queries, K - 4),
                    replace=False)
    for q in qs:
        v, _ = bow_transform(vocab, view(int(q), noisy=True),
                             jnp.ones((F,), bool))
        s = np.asarray(bow_score(bank, v))
        near = np.abs(np.arange(K) - q) <= 2
        true_s = float(s[near].max())
        imp_s = float(s[~near].max())
        seps.append(true_s - imp_s)
        best_imp.append(imp_s)
        top1 += int(true_s > imp_s)
    seps = np.asarray(seps)
    return {
        "K": K, "W": W,
        "top1_acc": round(top1 / len(qs), 3),
        "sep_mean": round(float(seps.mean()), 4),
        "sep_min": round(float(seps.min()), 4),
        "impostor_mean": round(float(np.mean(best_imp)), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Ks", type=int, nargs="*",
                    default=[64, 256, 1024])
    ap.add_argument("--Ws", type=int, nargs="*",
                    default=[1024, 4096, 16384])
    ap.add_argument("--out", default="artifacts/vocab_scale_r4")
    args = ap.parse_args()

    import jax

    rows = []
    for K in args.Ks:
        for W in args.Ws:
            r = run_one(K, W)
            rows.append(r)
            print(json.dumps(r), flush=True)
            jax.clear_caches()

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump({"flip": 0.08, "F": 128, "stride": 64,
                   "rows": rows}, f, indent=1)
    print("wrote", os.path.join(args.out, "results.json"))


if __name__ == "__main__":
    main()

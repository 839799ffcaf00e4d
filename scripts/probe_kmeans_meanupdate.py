#!/usr/bin/env python
"""VERDICT r15 item 8: probe the k-means mean-update pass at
production k (>=1000) — is the O(k·n) masked-mean loop material next
to the chunked-sgemm assign, and would a per-dim bincount pass
(O(n·d)) beat it?

Adoption bar (from the verdict): only adopt WITH an explicit re-pin —
np.ndarray.mean uses pairwise summation while bincount accumulates
sequentially, so the two are NOT bit-identical in general. This probe
measures both forms interleaved and reports the numeric divergence so
the adopt/skip decision is evidence-based.

Pure numpy, no Spark. Usage: python scripts/probe_kmeans_meanupdate.py
"""

from __future__ import annotations

import time

import numpy as np

K, N, D, REPS = 1000, 65536, 64, 5
CHUNK = 8192  # mirrors similarity._LLOYD_CHUNK


def main() -> None:
    rng = np.random.RandomState(7)
    # clustered-ish data: centers + noise (what the assign sees in practice)
    true_c = rng.randn(K, D) * 10
    x = true_c[rng.randint(K, size=N)] + rng.randn(N, D)
    c = true_c + rng.randn(K, D) * 0.01

    # the production assign (chunked f32 sgemm, as in _fit_quantizer)
    x32 = x.astype(np.float32)
    c32 = c.astype(np.float32)
    c_sq = (c32 * c32).sum(axis=1)

    def assign_pass():
        assign = np.empty(N, dtype=np.int64)
        for i in range(0, N, CHUNK):
            blk = x32[i : i + CHUNK]
            assign[i : i + CHUNK] = (c_sq[None, :] - 2.0 * (blk @ c32.T)).argmin(axis=1)
        return assign

    def masked_mean(assign):
        return np.array(
            [x[assign == j].mean(axis=0) if (assign == j).any() else c[j] for j in range(K)]
        )

    def bincount_mean(assign):
        counts = np.bincount(assign, minlength=K)
        sums = np.empty((K, D))
        for dim in range(D):
            sums[:, dim] = np.bincount(assign, weights=x[:, dim], minlength=K)
        out = np.where(counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], c)
        return out

    t_assign, t_masked, t_binc = [], [], []
    assign = assign_pass()
    for _ in range(REPS):
        t0 = time.perf_counter(); assign = assign_pass(); t_assign.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); m1 = masked_mean(assign); t_masked.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); m2 = bincount_mean(assign); t_binc.append(time.perf_counter() - t0)

    med = lambda v: sorted(v)[len(v) // 2]  # noqa: E731
    print(f"k={K} n={N} d={D} reps={REPS}")
    print(f"assign (chunked f32 sgemm) median {med(t_assign)*1e3:8.1f} ms")
    print(f"mean update, masked loop   median {med(t_masked)*1e3:8.1f} ms")
    print(f"mean update, bincount      median {med(t_binc)*1e3:8.1f} ms")
    diff = np.abs(m1 - m2)
    print(f"max |masked - bincount| = {diff.max():.3e}  (bit-identical: {bool((m1 == m2).all())})")
    share = med(t_masked) / (med(t_masked) + med(t_assign))
    print(f"masked mean update is {share:4.0%} of an assign+update iteration")


if __name__ == "__main__":
    main()

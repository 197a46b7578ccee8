#!/usr/bin/env python
"""Per-kernel microbenchmarks for the Pallas sweep passes on the real TPU.

Hoist-proof + dispatch-proof (round-2 methodology fix): each timing loop
threads a scalar from the kernel output back into an input so XLA cannot
hoist the loop-invariant call, and the reported time is the SLOPE between
two iteration counts, which cancels the tunnel's 10-45 ms variable
per-dispatch cost.  See docs/performance.md "Measurement methodology".

Usage: python tools/bench_kernels.py [--mn 10000] [--k 128]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, args, iters, label, lo=10, hi=110, reps=5):
    """Hoist-proof slope timing: the first arg (a factor matrix) is
    perturbed with a zero-valued scalar from each call's output, forcing
    truly sequential kernel executions; the reported ms/call is the median
    slope between ``lo`` and ``hi`` iterations (cancels dispatch cost).
    ``iters`` is accepted for CLI compatibility and ignored."""
    import statistics

    def mk(n):
        @jax.jit
        def loop(*a):
            def body(_, carry):
                first, rest = carry[0], carry[1:]
                out = fn(first, *rest)
                leaf = jax.tree.leaves(out)[0]
                dep = leaf.ravel()[0].astype(first.dtype) * 0.0
                return (first + dep,) + rest

            return jax.lax.fori_loop(0, n, body, a)

        return loop

    flo, fhi = mk(lo), mk(hi)
    float(flo(*args)[0].ravel()[0])
    float(fhi(*args)[0].ravel()[0])
    vals = []
    for _ in range(reps):
        t0 = time.time()
        float(flo(*args)[0].ravel()[0])
        tlo = time.time() - t0
        t0 = time.time()
        float(fhi(*args)[0].ravel()[0])
        thi = time.time() - t0
        vals.append((thi - tlo) / (hi - lo) * 1e3)
    dt = statistics.median(vals)
    print(f"{label:55s} {dt:8.3f} ms/call")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mn", type=int, default=10000)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--blocks", type=int, nargs="+", default=[512])
    args = ap.parse_args()

    from nbmf_mm_tpu.ops import pallas_sweep as ps

    M = N = args.mn
    K = args.k
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} M=N={M} K={K} iters={args.iters}")

    for blk in args.blocks:
        bm = bn = blk
        Mp = ps.round_up(M, ps._pick_block(M, bm))
        Np = ps.round_up(N, ps._pick_block(N, bn))
        Y = jnp.asarray((rng.random((Mp, Np)) < 0.3), dtype=jnp.float32)
        W = jnp.asarray(rng.uniform(0.1, 0.9, (K, Mp)), dtype=jnp.float32)
        W = W / W.sum(axis=0, keepdims=True)
        H = jnp.asarray(rng.uniform(0.1, 0.9, (K, Np)), dtype=jnp.float32)
        kw = dict(block_m=bm, block_n=bn)
        print(f"--- block {bm}x{bn} (padded {Mp}x{Np}) ---")
        time_fn(
            lambda W, H, Y: ps.hloss_terms(W, H, Y, m_real=M, n_real=N, **kw),
            (W, H, Y), args.iters, f"hloss_terms b={blk}",
        )
        time_fn(
            lambda W, H, Y: ps.h_terms(W, H, Y, **kw),
            (W, H, Y), args.iters, f"h_terms (no loss) b={blk}",
        )
        time_fn(
            lambda W, H, Y: ps.w_terms(W, H, Y, n_real=N, **kw),
            (W, H, Y), args.iters, f"w_terms b={blk}",
        )
    for bm in (128, 256, 512):
        if hasattr(ps, "hloss_terms_stripe"):
            Mp = ps.round_up(M, 128); Np = ps.round_up(N, 128)
            Y = jnp.asarray((rng.random((Mp, Np)) < 0.3), dtype=jnp.float32)
            W = jnp.asarray(rng.uniform(0.1, 0.9, (K, Mp)), dtype=jnp.float32)
            W = W / W.sum(axis=0, keepdims=True)
            H = jnp.asarray(rng.uniform(0.1, 0.9, (K, Np)), dtype=jnp.float32)
            time_fn(
                lambda W, H, Y, bm=bm: ps.hloss_terms_stripe(W, H, Y, m_real=M, n_real=N, block_m=bm),
                (W, H, Y), args.iters, f"hloss_terms_stripe bm={bm}",
            )
            time_fn(
                lambda W, H, Y, bm=bm: ps.w_terms_stripe(W, H, Y, n_real=N, block_m=bm),
                (W, H, Y), args.iters, f"w_terms_stripe bm={bm}",
            )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-kernel microbenchmarks for the Pallas sweep passes on the real TPU.

Times each pass (hloss_terms, w_terms, and experimental variants) standalone
inside one jitted fori_loop (the axon tunnel's ~3 ms dispatch latency makes
per-call timing meaningless), syncing via a scalar pull.  Used to attack the
round-1 "revisited-accumulator grid" headroom (docs/performance.md).

Usage: python tools/bench_kernels.py [--mn 10000] [--k 128] [--iters 30]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, args, iters, label):
    """Run fn(args) iters times inside one jit; return ms/call."""

    @jax.jit
    def loop(*a):
        def body(_, acc):
            out = fn(*a)
            # fold a scalar from the output into the carry so nothing is DCE'd
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    r = loop(*args)
    float(r)  # warm + sync
    t0 = time.time()
    r = loop(*args)
    float(r)
    dt = (time.time() - t0) / iters * 1e3
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
        if hasattr(ps, "hloss_terms_resident"):
            time_fn(
                lambda W, H, Y: ps.hloss_terms_resident(W, H, Y, m_real=M, n_real=N, **kw),
                (W, H, Y), args.iters, f"hloss_terms_resident b={blk}",
            )
        if hasattr(ps, "w_terms_resident"):
            time_fn(
                lambda W, H, Y: ps.w_terms_resident(W, H, Y, n_real=N, **kw),
                (W, H, Y), args.iters, f"w_terms_resident b={blk}",
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

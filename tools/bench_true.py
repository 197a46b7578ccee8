#!/usr/bin/env python
"""Hoist-proof, dispatch-proof kernel timing.

Two systematic errors invalidate naive microbenchmarks on this backend:

1. **Loop-invariant hoisting**: a `fori_loop` whose body calls a pure kernel
   on loop-invariant inputs is optimized by XLA to run the kernel ONCE.
   Every timing loop must thread the kernel output back into the next
   iteration's input.
2. **Per-dispatch overhead**: one jitted call through the axon tunnel
   carries a large variable fixed cost (measured 10-45 ms).  Per-call times
   must be the SLOPE between two iteration counts, not total/iters.

This harness does both: the body perturbs an input with `ll * 0.0` (a true
data dependency, dead-cheap), and reports median slope over reps.
"""
import sys
import time
import statistics
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def true_time(fn, W, H, args, label, lo=10, hi=110, reps=5, quiet=False):
    """fn(W, H, *args) -> pytree; a scalar-ish leaf of the output is folded
    back into W so iterations are truly sequential."""

    def mk(iters):
        @jax.jit
        def loop(W, H, *a):
            def body(_, carry):
                W, H = carry
                out = fn(W, H, *a)
                leaf = jax.tree.leaves(out)[0]
                dep = leaf.ravel()[0].astype(W.dtype) * 0.0
                return (W + dep, H)

            return jax.lax.fori_loop(0, iters, body, (W, H))

        return loop

    flo, fhi = mk(lo), mk(hi)
    float(flo(W, H, *args)[0][0, 0])
    float(fhi(W, H, *args)[0][0, 0])
    vals = []
    for _ in range(reps):
        t0 = time.time()
        float(flo(W, H, *args)[0][0, 0])
        tlo = time.time() - t0
        t0 = time.time()
        float(fhi(W, H, *args)[0][0, 0])
        thi = time.time() - t0
        vals.append((thi - tlo) / (hi - lo) * 1e3)
    med = statistics.median(vals)
    if not quiet:
        print(f"{label:48s} {med:8.3f} ms/call "
              f"(reps: {' '.join(f'{v:.2f}' for v in vals)})")
    return med


def main():
    from nbmf_mm_tpu.ops import pallas_sweep as ps
    from tools.bench_packed import pack_bits
    from tools.bench_packed2 import hloss_packed2, w_packed2
    from tools.bench_packed3 import hloss_ngrid, pack_bits_global, mxu_probe

    M = N = 10240
    K = 128
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} M=N={M} K={K}")
    Y = jnp.asarray((rng.random((M, N)) < 0.3), dtype=jnp.float32)
    W = jnp.asarray(rng.uniform(0.1, 0.9, (K, M)), dtype=jnp.float32)
    W = W / W.sum(axis=0, keepdims=True)
    H = jnp.asarray(rng.uniform(0.1, 0.9, (K, N)), dtype=jnp.float32)
    Yp = pack_bits(Y, 256)
    Ypg = pack_bits_global(Y)

    true_time(lambda W, H, Y: ps.hloss_terms_stripe(W, H, Y, m_real=M, n_real=N, block_m=256),
              W, H, (Y,), "dense hloss stripe")
    true_time(lambda W, H, Y: ps.w_terms_stripe(W, H, Y, n_real=N, block_m=256),
              W, H, (Y,), "dense w stripe")
    true_time(lambda W, H: mxu_probe(W, H, variant="chain3_tile"),
              W, H, (), "mxu chain3_tile f32")
    true_time(lambda W, H: mxu_probe(W, H, variant="chain3_tile", mxu_dtype=jnp.bfloat16),
              W, H, (), "mxu chain3_tile bf16")
    true_time(lambda W, H, Yp: hloss_packed2(W, H, Yp, block_m=256),
              W, H, (Yp,), "packed2 hloss select f32")
    true_time(lambda W, H, Yp: w_packed2(W, H, Yp, n_real=N, block_m=256),
              W, H, (Yp,), "packed2 w select f32")
    true_time(lambda W, H, Yp: hloss_packed2(W, H, Yp, block_m=256, mxu_dtype=jnp.bfloat16),
              W, H, (Yp,), "packed2 hloss select bf16")
    true_time(lambda W, H, Yp: w_packed2(W, H, Yp, n_real=N, block_m=256, mxu_dtype=jnp.bfloat16),
              W, H, (Yp,), "packed2 w select bf16")
    true_time(lambda W, H, Yp: hloss_ngrid(W, H, Yp, block_n=256, packed=True),
              W, H, (Ypg,), "ngrid packed hloss f32")
    true_time(lambda W, H, Yp: hloss_ngrid(W, H, Yp, block_n=256, packed=True, mxu_dtype=jnp.bfloat16),
              W, H, (Ypg,), "ngrid packed hloss bf16")


if __name__ == "__main__":
    main()

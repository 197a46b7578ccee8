#!/usr/bin/env python
"""Diagnostic Pallas kernels: isolate MXU, VPU, and HBM components of the
sweep passes to find the binding resource on the real chip.

.. warning:: SUPERSEDED — the timing loop here feeds loop-invariant inputs,
   which XLA hoists: the loop executes the kernel ONCE and the reported
   per-call numbers are dominated by the tunnel's 10-45 ms dispatch cost
   divided by the iteration count.  Round-2 conclusions drawn from this
   tool (the "525 GB/s stream ceiling", per-component pass splits) were
   measurement artifacts.  Use tools/bench_true.py (loop-carried inputs +
   slope timing) instead; see docs/performance.md "Measurement
   methodology".

Each kernel uses the same grid/blocking as the production H pass
(grid (n, m), data tile (bm, bn), factors (k, bm)/(k, bn)):

- mxu_only:   wh + 2 accumulating contractions, no VPU math (precision arg
              swept: DEFAULT / HIGHEST) -> MXU floor at each pass count
- vpu_only:   the full ratio+log elementwise chain on the data tile, no
              matmuls -> VPU floor
- hbm_only:   data tile reduced with one add -> stream floor
"""
import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(kind, k, Mp, Np, bm, bn, precision):
    grid = (Np // bn, Mp // bm)

    def kernel(w_ref, h_ref, ym_ref, num_ref, den_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            num_ref[...] = jnp.zeros(num_ref.shape, num_ref.dtype)
            den_ref[...] = jnp.zeros(den_ref.shape, den_ref.dtype)

        w = w_ref[...]
        ym = ym_ref[...]
        if kind == "mxu_only":
            wh = jax.lax.dot_general(w, h_ref[...], (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)
            num_ref[...] += jax.lax.dot_general(w, wh + ym, (((1,), (0,)), ((), ())),
                                                preferred_element_type=jnp.float32,
                                                precision=precision)
            den_ref[...] += jax.lax.dot_general(w, wh - ym, (((1,), (0,)), ((), ())),
                                                preferred_element_type=jnp.float32,
                                                precision=precision)
        elif kind == "vpu_only":
            wh = ym  # stand-in (no matmul)
            a = wh + 1e-8
            b = 1.0 - wh + 1e-8
            r = 1.0 / (a * b)
            p = ym * (b * r)
            q = (1.0 - ym) * (a * r)
            ll = ym * jnp.log(a) + (1.0 - ym) * jnp.log(b)
            num_ref[...] += jnp.sum(p + ll, axis=0)[None, :]
            den_ref[...] += jnp.sum(q, axis=0)[None, :]
        elif kind == "hbm_only":
            num_ref[...] += jnp.sum(ym, axis=0)[None, :]
            den_ref[...] += 1.0

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bm), lambda i, j: (0, j)),
            pl.BlockSpec((k, bn), lambda i, j: (0, i)),
            pl.BlockSpec((bm, bn), lambda i, j: (j, i)),
        ],
        out_specs=(
            pl.BlockSpec((k, bn), lambda i, j: (0, i)),
            pl.BlockSpec((k, bn), lambda i, j: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), jnp.float32),
            jax.ShapeDtypeStruct((k, Np), jnp.float32),
        ),
    )


def time_fn(fn, args, iters, label):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            out = fn(*a)
            return acc + jax.tree.leaves(out)[0].ravel()[0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.time()
    float(loop(*args))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:50s} {dt:8.3f} ms/call", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mn", type=int, default=10240)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()
    Mp = Np = args.mn
    K, bm = args.k, args.block
    bn = bm
    rng = np.random.default_rng(0)
    Y = jnp.asarray((rng.random((Mp, Np)) < 0.3), dtype=jnp.float32)
    W = jnp.asarray(rng.uniform(0.1, 0.9, (K, Mp)), dtype=jnp.float32)
    H = jnp.asarray(rng.uniform(0.1, 0.9, (K, Np)), dtype=jnp.float32)
    print(f"backend={jax.default_backend()} {Mp}x{Np} K={K} block={bm}")
    for kind in ["hbm_only", "vpu_only"]:
        fn = make_kernel(kind, K, Mp, Np, bm, bn, None)
        time_fn(fn, (W, H, Y), args.iters, kind)
    for prec in ["DEFAULT", "HIGHEST"]:
        fn = make_kernel("mxu_only", K, Mp, Np, bm, bn,
                         getattr(jax.lax.Precision, prec))
        time_fn(fn, (W, H, Y), args.iters, f"mxu_only precision={prec}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""HBM stream-rate sweep: measure effective bandwidth reading the (M, N)
data matrix through Pallas at different tile shapes and dtypes.

.. warning:: SUPERSEDED — the timing loop feeds loop-invariant inputs,
   which XLA hoists: the loop executes the kernel ONCE and the numbers are
   dominated by the tunnel's variable dispatch cost.  The round-2
   "stream-bound, ~525 GB/s ceiling" conclusions drawn from this tool were
   measurement artifacts (the passes are matmul-rate-bound).  Use
   tools/bench_true.py; see docs/performance.md "Measurement methodology".
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stream_kernel(Mp, Np, bm, bn, dtype):
    grid = (Np // bn, Mp // bm) if bn < Np else (Mp // bm,)

    if bn < Np:
        def kernel(ym_ref, out_ref):
            @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
            def _init():
                out_ref[0, 0] = jnp.zeros((), jnp.float32)
            out_ref[0, 0] += jnp.sum(ym_ref[...].astype(jnp.float32))
        in_spec = pl.BlockSpec((bm, bn), lambda i, j: (j, i))
        out_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    else:
        def kernel(ym_ref, out_ref):
            @pl.when(pl.program_id(0) == 0)
            def _init():
                out_ref[0, 0] = jnp.zeros((), jnp.float32)
            out_ref[0, 0] += jnp.sum(ym_ref[...].astype(jnp.float32))
        in_spec = pl.BlockSpec((bm, Np), lambda j: (j, 0))
        out_spec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mn", type=int, default=10240)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    Mp = Np = args.mn
    rng = np.random.default_rng(0)
    Yf = jnp.asarray((rng.random((Mp, Np)) < 0.3), dtype=jnp.float32)
    Yb = Yf.astype(jnp.bfloat16)
    print(f"backend={jax.default_backend()} {Mp}x{Np}")
    configs = [
        (512, 512, "f32"), (512, 1024, "f32"), (512, 2048, "f32"),
        (256, 2048, "f32"), (1024, 2048, "f32"),
        (256, Np, "f32"), (512, Np, "f32"),
        (512, 512, "bf16"), (512, Np, "bf16"), (256, Np, "bf16"),
    ]
    for bm, bn, dt in configs:
        Y = Yf if dt == "f32" else Yb
        nbytes = Mp * Np * (4 if dt == "f32" else 2)
        try:
            fn = stream_kernel(Mp, Np, bm, bn, dt)

            @jax.jit
            def loop(y):
                def body(_, acc):
                    return acc + fn(y)[0, 0]
                return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

            float(loop(Y))
            t0 = time.time()
            float(loop(Y))
            dt_ms = (time.time() - t0) / args.iters * 1e3
            print(f"tile ({bm:5d},{bn:5d}) {dt} : {dt_ms:7.3f} ms  "
                  f"{nbytes / dt_ms / 1e6:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"tile ({bm},{bn}) {dt}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()

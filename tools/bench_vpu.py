#!/usr/bin/env python
"""Microbenchmarks of the per-element (VPU) sub-costs inside a stripe pass:
data stream + sum, unpack formulations, ratio math, loss forms.  Each kernel
runs the m-stripe grid shape of the real passes with NO matmuls, so the
numbers are the isolated VPU+stream cost of that fragment.

.. note:: Timing here is loop-carried (hoist-immune) but SINGLE-COUNT
   (total/iters): through the axon tunnel the 10-45 ms variable dispatch
   cost biases short runs by up to tens of percent.  Numbers from this
   tool guided kernel-structure choices only; decision-grade measurements
   use slope timing (tools/bench_true.py, bench.py).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from nbmf_mm_tpu.ops import pallas_sweep as ps
from tools.bench_packed import pack_bits, time_fn

pltpu = ps.pltpu
_VMEM = ps._VMEM
_SMEM = ps._SMEM


def frag_kernel(X, *, frag, bm=256, packed=False):
    Mp_or_w, Np = X.shape
    Mp = Mp_or_w * 32 if packed else Mp_or_w
    bmw = bm // 32
    grid = (Mp // bm,)
    acc = jnp.float32

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_ref[0, 0] = jnp.zeros((), acc)

        if frag == "stream_sum":
            out_ref[0, 0] += jnp.sum(x_ref[...].astype(acc))
        elif frag == "unpack_concat_int":
            pw = x_ref[...]
            ym = jnp.concatenate([(pw >> b) & 1 for b in range(32)], axis=0)
            out_ref[0, 0] += jnp.sum(ym.astype(acc))
        elif frag == "unpack_concat_sign":
            pw = x_ref[...]
            bit = jnp.concatenate([(pw << (31 - b)) for b in range(32)], axis=0) < 0
            out_ref[0, 0] += jnp.sum(jnp.where(bit, 1.0, 0.0))
        elif frag == "unpack_repeat_shift":
            pw = x_ref[...]
            rep = pltpu.repeat(pw, 32, axis=0) if pltpu else jnp.repeat(pw, 32, axis=0)
            sh = jax.lax.broadcasted_iota(jnp.int32, (bm, Np), 0) % 32
            ym = (rep >> sh) & 1
            out_ref[0, 0] += jnp.sum(ym.astype(acc))
        elif frag == "ratios":
            wh = x_ref[...].astype(acc) * 0.5  # stand-in for wh
            a = wh + 1e-8
            b = 1.0 - wh + 1e-8
            r = 1.0 / (a * b)
            out_ref[0, 0] += jnp.sum(a * r) + jnp.sum(b * r)
        elif frag == "loss2log":
            ym = x_ref[...].astype(acc)
            a = ym * 0.4 + 0.3
            b = 1.0 - a
            out_ref[0, 0] += jnp.sum(ym * jnp.log(a) + (1.0 - ym) * jnp.log(b))
        elif frag == "loss1log":
            ym = x_ref[...].astype(acc)
            a = ym * 0.4 + 0.3
            b = 1.0 - a
            out_ref[0, 0] += jnp.sum(jnp.log(jnp.where(ym > 0.5, a, b)))
        else:
            raise ValueError(frag)

    block = (bmw, Np) if packed else (bm, Np)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(block, lambda i: (i, 0), memory_space=_VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=_SMEM if pltpu else pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1, 1), acc),
        compiler_params=ps._resident_params(),
    )
    return call(X)


def main():
    M = N = 10240
    rng = np.random.default_rng(0)
    Y = jnp.asarray((rng.random((M, N)) < 0.3), dtype=jnp.float32)
    Yp = pack_bits(Y, 256)
    iters = 30
    print(f"backend={jax.default_backend()} M=N={M}")

    time_fn(lambda Y: frag_kernel(Y, frag="stream_sum"), (Y,), iters,
            "dense stream + sum")
    time_fn(lambda Yp: frag_kernel(Yp, frag="stream_sum", packed=True), (Yp,),
            iters, "packed stream + sum (words only)")
    time_fn(lambda Yp: frag_kernel(Yp, frag="unpack_concat_int", packed=True),
            (Yp,), iters, "unpack concat-int + sum")
    time_fn(lambda Yp: frag_kernel(Yp, frag="unpack_concat_sign", packed=True),
            (Yp,), iters, "unpack concat-sign-select + sum")
    try:
        time_fn(lambda Yp: frag_kernel(Yp, frag="unpack_repeat_shift", packed=True),
                (Yp,), iters, "unpack repeat+varshift + sum")
    except Exception as e:
        print("repeat+varshift failed:", str(e)[:120])
    time_fn(lambda Y: frag_kernel(Y, frag="ratios"), (Y,), iters,
            "ratio math (recip + muls) + sums")
    time_fn(lambda Y: frag_kernel(Y, frag="loss2log"), (Y,), iters,
            "loss 2-log form")
    time_fn(lambda Y: frag_kernel(Y, frag="loss1log"), (Y,), iters,
            "loss 1-log select form")


if __name__ == "__main__":
    main()

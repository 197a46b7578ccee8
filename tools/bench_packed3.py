#!/usr/bin/env python
"""Experiment round 3: isolate the per-stripe cost structure.

Probes:
  1. MXU-only, outputs written once per step (no revisited accumulators)
     vs the accumulating variant — isolates VMEM accumulator traffic.
  2. Independent vs chained matmuls — isolates dependency stalls.
  3. n-grid (column-stripe) H pass: wh/ratios on (Mp, bn), num/den tiles
     written ONCE per step.  Dense and packed variants.

.. note:: Timing here is loop-carried (hoist-immune) but SINGLE-COUNT
   (total/iters): through the axon tunnel the 10-45 ms variable dispatch
   cost biases short runs by up to tens of percent.  Numbers from this
   tool guided kernel-structure choices only; decision-grade measurements
   use slope timing (tools/bench_true.py, bench.py).
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

from nbmf_mm_tpu.ops import pallas_sweep as ps
from tools.bench_packed import time_fn

pltpu = ps.pltpu
_VMEM = ps._VMEM
_SMEM = ps._SMEM


def mxu_probe(W, H, *, variant, block_m=256, mxu_dtype=None):
    """MXU probes: 'chain3_acc' (3 dependent matmuls + revisited (k,Np)
    accumulators), 'chain3_tile' (3 dependent, (k,bm) output tiles written
    once), 'indep3_tile' (3 independent matmuls, tiles written once)."""
    k, Mp = W.shape
    _, Np = H.shape
    bm = block_m
    grid = (Mp // bm,)
    acc = jnp.float32
    mxu = mxu_dtype or W.dtype

    def kernel(w_ref, h_ref, o1_ref, o2_ref):
        j = pl.program_id(0)
        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        if variant == "chain3_acc":
            @pl.when(j == 0)
            def _init():
                o1_ref[...] = jnp.zeros(o1_ref.shape, o1_ref.dtype)
                o2_ref[...] = jnp.zeros(o2_ref.shape, o2_ref.dtype)
            wh = jax.lax.dot_general(w, h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=acc)
            o1_ref[...] += jax.lax.dot_general(
                w, wh.astype(mxu), (((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            o2_ref[...] += jax.lax.dot_general(
                w, (wh + 1.0).astype(mxu), (((1,), (0,)), ((), ())),
                preferred_element_type=acc)
        elif variant == "chain3_tile":
            wh = jax.lax.dot_general(w, h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=acc)
            t1 = jax.lax.dot_general(h, wh.astype(mxu), (((1,), (1,)), ((), ())),
                                     preferred_element_type=acc)  # (k, bm)
            t2 = jax.lax.dot_general(h, (wh + 1.0).astype(mxu),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=acc)
            o1_ref[...] = t1
            o2_ref[...] = t2
        else:
            raise ValueError(variant)

    if variant == "chain3_acc":
        out_specs = (
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
        )
        out_shape = (jax.ShapeDtypeStruct((k, Np), W.dtype),
                     jax.ShapeDtypeStruct((k, Np), W.dtype))
    else:
        out_specs = (
            pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
            pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
        )
        out_shape = (jax.ShapeDtypeStruct((k, Mp), W.dtype),
                     jax.ShapeDtypeStruct((k, Mp), W.dtype))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(flops=6 * Mp * Np * k, bytes_accessed=0,
                                      transcendentals=0),
        compiler_params=ps._resident_params(),
    )
    return call(W, H)


# --------------------------- n-grid (column stripe) H+loss pass, dense data
def hloss_ngrid(W, H, Y, *, eps=1e-8, block_n=256, mxu_dtype=None,
                packed=False, interpret=False):
    """H pass gridded over n: per step stream the (Mp, bn) data column
    stripe (dense) or its packed words (Mp//32, bn), compute wh/ratios on
    (Mp, bn), and write the (k, bn) Num/Den tiles ONCE.  For packed=True
    the data rows arrive in bit-plane order; the caller passes W with its
    columns pre-permuted to match (plane-order permutation), which leaves
    the (k, bn) outputs and the loss unchanged (m is fully contracted)."""
    k, Mp = W.shape
    _, Np = H.shape
    bn = block_n
    grid = (Np // bn,)
    acc = jnp.float32
    mxu = mxu_dtype or W.dtype
    Mw = Mp // 32

    def kernel(w_ref, h_ref, y_ref, num_ref, den_ref, ll_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            ll_ref[0, 0] = jnp.zeros((), acc)

        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )  # (Mp, bn)
        a = wh + eps
        b = 1.0 - wh + eps
        r = 1.0 / (a * b)
        if packed:
            pw = y_ref[...]  # (Mw, bn) int32
            bit = jnp.concatenate([(pw << (31 - t)) for t in range(32)],
                                  axis=0) < 0
            p = jnp.where(bit, b * r, 0.0)
            q = jnp.where(bit, 0.0, a * r)
            ll = jnp.log(jnp.where(bit, a, b))
        else:
            ym = y_ref[...].astype(acc)
            p = ym * (b * r)
            q = (1.0 - ym) * (a * r)
            ll = ym * jnp.log(a) + (1.0 - ym) * jnp.log(b)
        num_ref[...] = jax.lax.dot_general(
            w, p.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        den_ref[...] = jax.lax.dot_general(
            w, q.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        ll_ref[0, 0] += jnp.sum(ll)

    data_spec = (
        pl.BlockSpec((Mw, bn), lambda i: (0, i), memory_space=_VMEM)
        if packed else
        pl.BlockSpec((Mp, bn), lambda i: (0, i), memory_space=_VMEM)
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, Mp), lambda i: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=_VMEM),
            data_spec,
        ],
        out_specs=(
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=_SMEM if pltpu else pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((1, 1), acc),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * Np * k,
            bytes_accessed=(Mp * Np // 8) if packed else Mp * Np * 4,
            transcendentals=Mp * Np,
        ),
        compiler_params=ps._resident_params(),
        interpret=interpret,
    )
    Num, Den, ll = call(W, H, Y)
    return Num, Den, ll[0, 0]


def pack_bits_global(Ymp):
    """Global bit-plane packing along m: word (i, :) bit b = row b*(Mp/32)+i.
    Matches the n-grid kernel's concat unpack with plane stride Mp//32."""
    Mp, Np = Ymp.shape
    Mw = Mp // 32
    bits = Ymp.astype(jnp.int32).reshape(32, Mw, Np)
    shifts = jnp.arange(32, dtype=jnp.int32)[:, None, None]
    return jnp.bitwise_or.reduce(bits << shifts, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mn", type=int, default=10240)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    M = N = args.mn
    K = args.k
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} M=N={M} K={K} iters={args.iters}")

    Mp = ps.round_up(M, 128)
    Np = ps.round_up(N, 128)
    Y = jnp.asarray((rng.random((Mp, Np)) < 0.3), dtype=jnp.float32)
    W = jnp.asarray(rng.uniform(0.1, 0.9, (K, Mp)), dtype=jnp.float32)
    W = W / W.sum(axis=0, keepdims=True)
    H = jnp.asarray(rng.uniform(0.1, 0.9, (K, Np)), dtype=jnp.float32)
    Ypg = pack_bits_global(Y)

    # correctness of n-grid vs stripe (dense; identical formulas)
    n0, d0, l0 = ps.hloss_terms_stripe(W, H, Y, m_real=M, n_real=N, block_m=256)
    n1, d1, l1 = hloss_ngrid(W, H, Y, block_n=256)
    print("ngrid dense allclose:",
          bool(jnp.allclose(n0, n1, rtol=1e-6)),
          bool(jnp.allclose(d0, d1, rtol=1e-6)),
          float(jnp.abs(l0 - l1)))
    n2, d2, l2 = hloss_ngrid(W, H, Ypg, block_n=256, packed=True)
    print("ngrid packed == ngrid dense:",
          bool(jnp.all(n1 == n2)), bool(jnp.all(d1 == d2)), bool(l1 == l2))

    for v in ("chain3_acc", "chain3_tile"):
        time_fn(lambda W, H, v=v: mxu_probe(W, H, variant=v),
                (W, H), args.iters, f"mxu_probe {v} f32")
        time_fn(lambda W, H, v=v: mxu_probe(W, H, variant=v, mxu_dtype=jnp.bfloat16),
                (W, H), args.iters, f"mxu_probe {v} bf16")

    for bn in (128, 256):
        time_fn(lambda W, H, Y, bn=bn: hloss_ngrid(W, H, Y, block_n=bn),
                (W, H, Y), args.iters, f"hloss_ngrid dense f32 bn={bn}")
    for bn in (128, 256):
        time_fn(lambda W, H, Yp, bn=bn: hloss_ngrid(W, H, Yp, block_n=bn, packed=True),
                (W, H, Ypg), args.iters, f"hloss_ngrid packed f32 bn={bn}")
    time_fn(lambda W, H, Yp: hloss_ngrid(W, H, Yp, block_n=256, packed=True,
                                         mxu_dtype=jnp.bfloat16),
            (W, H, Ypg), args.iters, "hloss_ngrid packed bf16 bn=256")


if __name__ == "__main__":
    main()

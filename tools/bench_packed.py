#!/usr/bin/env python
"""Experiment: bitpacked binary-data stripe kernels.

The sweep passes are HBM-element-bound (docs/performance.md): the 2-read
structure has a ~1.6 ms/sweep floor at 10^4 x 10^4 f32.  But the data matrix
is BINARY (the model's contract), so it can be packed 32 entries / int32
word, shrinking the stream ~32x.  Unpacked values are exactly 0.0/1.0 f32,
so all downstream arithmetic is bit-identical to the dense stripe kernels.

Packing layout (stripe-local bit planes along m, for stripe block bm):
  word row w = j*bmw + i, bit b  <->  data row j*bm + b*bmw + i   (bmw = bm/32)
so the in-kernel unpack is 32 shift-and ops concatenated along sublanes,
reproducing rows j*bm .. j*bm+bm in EXACT order — no permutation anywhere.

Measures: correctness vs the dense stripe kernels, standalone pass times,
and a full chained sweep loop, at f32 and bf16 MXU operand precision.

.. warning:: the standalone `time_fn` numbers here are contaminated by
   loop-invariant hoisting + dispatch overhead (discovered mid-round); only
   the full sweep-loop numbers (loop-carried W/H) are real.  The corrected
   harness is tools/bench_true.py.  Kept as the experiment record.

Usage: python tools/bench_packed.py [--mn 10240] [--k 128] [--iters 30]
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

pltpu = ps.pltpu
_VMEM = ps._VMEM
_SMEM = ps._SMEM


# ----------------------------------------------------------------- packing
def pack_bits(Ymp, bm: int):
    """Pack a padded binary (Mp, Np) matrix into (Mp//32, Np) int32 words in
    the stripe-local bit-plane layout for stripe block ``bm``."""
    Mp, Np = Ymp.shape
    assert bm % 32 == 0 and Mp % bm == 0
    bmw = bm // 32
    S = Mp // bm
    bits = Ymp.astype(jnp.int32).reshape(S, 32, bmw, Np)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, :, None, None]
    packed = jnp.bitwise_or.reduce((bits << shifts), axis=1)
    return packed.reshape(Mp // 32, Np)


def _unpack(pw, bm, acc):
    """(bmw, Np) int32 words -> (bm, Np) acc-dtype 0.0/1.0 values."""
    planes = [((pw >> b) & 1) for b in range(32)]
    return jnp.concatenate(planes, axis=0).astype(acc)


# ------------------------------------------------------- packed H+loss pass
def hloss_packed(W, H, Yp, *, eps=1e-8, block_m=256, mxu_dtype=None,
                 interpret=False):
    k, Mp = W.shape
    _, Np = H.shape
    bm = block_m
    bmw = bm // 32
    grid = (Mp // bm,)
    acc = jnp.float32
    mxu = mxu_dtype or W.dtype

    def kernel(w_ref, h_ref, yp_ref, num_ref, den_ref, ll_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            num_ref[...] = jnp.zeros(num_ref.shape, num_ref.dtype)
            den_ref[...] = jnp.zeros(den_ref.shape, den_ref.dtype)
            ll_ref[0, 0] = jnp.zeros((), acc)

        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        ym = _unpack(yp_ref[...], bm, acc)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )
        yc = 1.0 - ym
        a = wh + eps
        b = 1.0 - wh + eps
        r = 1.0 / (a * b)
        p = ym * (b * r)
        q = yc * (a * r)
        num_ref[...] += jax.lax.dot_general(
            w, p.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        den_ref[...] += jax.lax.dot_general(
            w, q.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        ll = ym * jnp.log(a) + yc * jnp.log(b)
        ll_ref[0, 0] += jnp.sum(ll)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((bmw, Np), lambda j: (j, 0), memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=_SMEM if pltpu else pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((1, 1), acc),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * Np * k, bytes_accessed=Mp * Np // 8,
            transcendentals=2 * Mp * Np,
        ),
        compiler_params=ps._resident_params(),
        interpret=interpret,
    )
    Num, Den, ll = call(W, H, Yp)
    return Num, Den, ll[0, 0]


# ----------------------------------------------------------- packed W pass
def w_packed(W, H_new, Yp, *, n_real, eps=1e-8, block_m=256, mxu_dtype=None,
             interpret=False):
    k, Mp = W.shape
    _, Np = H_new.shape
    bm = block_m
    bmw = bm // 32
    grid = (Mp // bm,)
    acc = jnp.float32
    mxu = mxu_dtype or W.dtype

    def kernel(w_ref, h_ref, yp_ref, t_ref):
        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        ym = _unpack(yp_ref[...], bm, acc)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )
        a = wh + eps
        b = 1.0 - wh + eps
        r = 1.0 / (a * b)
        p = ym * (b * r)
        col = jax.lax.broadcasted_iota(jnp.int32, (bm, Np), 1)
        ym2 = jnp.where(col < n_real, 1.0 - ym, 0.0)
        q = ym2 * (a * r)
        t_ref[...] = jax.lax.dot_general(
            h, (p - q).astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        ) + jnp.sum(q, axis=1)[None, :]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((bmw, Np), lambda j: (j, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((k, Mp), W.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * Np * k, bytes_accessed=Mp * Np // 8, transcendentals=0,
        ),
        compiler_params=ps._resident_params(dimension_semantics=("parallel",)),
        interpret=interpret,
    )
    return call(W, H_new, Yp)


def time_fn(fn, args, iters, label):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    r = loop(*args)
    float(r)
    t0 = time.time()
    float(loop(*args))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:55s} {dt:8.3f} ms/call")
    return dt


def sweep_loop(W0, H0, Yp, *, n_real, alpha, beta, eps=1e-8, block_m=256,
               mxu_dtype=None, iters=30):
    """Full chained sweep (hloss_packed -> H update -> w_packed -> W norm)."""

    @jax.jit
    def loop(W, H, Yp):
        def body(_, carry):
            W, H, ll_acc = carry
            Num, Den, ll = hloss_packed(
                W, H, Yp, eps=eps, block_m=block_m, mxu_dtype=mxu_dtype
            )
            num = H * Num + (alpha - 1.0)
            den = (1.0 - H) * Den + (beta - 1.0)
            H_new = jnp.clip(num / (num + den + eps), eps, 1.0 - eps)
            T = w_packed(
                W, H_new, Yp, n_real=n_real, eps=eps, block_m=block_m,
                mxu_dtype=mxu_dtype,
            )
            W_raw = W * T / n_real
            cols = W_raw.sum(axis=0, keepdims=True)
            W_new = W_raw / jnp.where(cols > 0, cols, 1.0)
            return (W_new, H_new, ll_acc + ll)

        return jax.lax.fori_loop(0, iters, body, (W, H, jnp.float32(0.0)))

    out = loop(W0, H0, Yp)
    float(out[2])
    t0 = time.time()
    out = loop(W0, H0, Yp)
    float(out[2])
    dt = (time.time() - t0) / iters * 1e3
    return dt


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

    # ---------------------------------------------------- correctness (small)
    Ms, Ns, Ks, bms = 512, 640, 16, 256
    Ys = jnp.asarray((rng.random((Ms, Ns)) < 0.3), dtype=jnp.float32)
    Ws = jnp.asarray(rng.uniform(0.1, 0.9, (Ks, Ms)), dtype=jnp.float32)
    Ws = Ws / Ws.sum(axis=0, keepdims=True)
    Hs = jnp.asarray(rng.uniform(0.1, 0.9, (Ks, Ns)), dtype=jnp.float32)
    Yps = pack_bits(Ys, bms)
    n0, d0, l0 = ps.hloss_terms_stripe(Ws, Hs, Ys, m_real=Ms, n_real=Ns, block_m=bms)
    n1, d1, l1 = hloss_packed(Ws, Hs, Yps, block_m=bms)
    t0 = ps.w_terms_stripe(Ws, Hs, Ys, n_real=Ns, block_m=bms)
    t1 = w_packed(Ws, Hs, Yps, n_real=Ns, block_m=bms)
    print("hloss Num exact:", bool(jnp.all(n0 == n1)),
          " Den exact:", bool(jnp.all(d0 == d1)),
          " ll exact:", bool(l0 == l1))
    print("wterms exact:", bool(jnp.all(t0 == t1)))

    # --------------------------------------------------------------- timing
    bm = 256
    Mp = ps.round_up(M, 128)
    Np = ps.round_up(N, 128)
    Y = jnp.asarray((rng.random((Mp, Np)) < 0.3), dtype=jnp.float32)
    W = jnp.asarray(rng.uniform(0.1, 0.9, (K, Mp)), dtype=jnp.float32)
    W = W / W.sum(axis=0, keepdims=True)
    H = jnp.asarray(rng.uniform(0.1, 0.9, (K, Np)), dtype=jnp.float32)
    Yp = pack_bits(Y, bm)
    print(f"packed bytes: {Yp.size * 4 / 1e6:.1f} MB vs dense {Y.size * 4 / 1e6:.1f} MB")

    time_fn(lambda W, H, Y: ps.hloss_terms_stripe(W, H, Y, m_real=M, n_real=N, block_m=bm),
            (W, H, Y), args.iters, "dense hloss_terms_stripe")
    time_fn(lambda W, H, Y: ps.w_terms_stripe(W, H, Y, n_real=N, block_m=bm),
            (W, H, Y), args.iters, "dense w_terms_stripe")
    time_fn(lambda W, H, Yp: hloss_packed(W, H, Yp, block_m=bm),
            (W, H, Yp), args.iters, "packed hloss f32")
    time_fn(lambda W, H, Yp: w_packed(W, H, Yp, n_real=N, block_m=bm),
            (W, H, Yp), args.iters, "packed wterms f32")
    time_fn(lambda W, H, Yp: hloss_packed(W, H, Yp, block_m=bm, mxu_dtype=jnp.bfloat16),
            (W, H, Yp), args.iters, "packed hloss bf16-mxu")
    time_fn(lambda W, H, Yp: w_packed(W, H, Yp, n_real=N, block_m=bm, mxu_dtype=jnp.bfloat16),
            (W, H, Yp), args.iters, "packed wterms bf16-mxu")

    for mxu, lbl in ((None, "f32"), (jnp.bfloat16, "bf16-mxu")):
        dt = sweep_loop(W, H, Yp, n_real=N, alpha=1.2, beta=1.2, block_m=bm,
                        mxu_dtype=mxu, iters=args.iters)
        print(f"full packed sweep loop {lbl:10s} {dt:8.3f} ms/sweep "
              f"({1e3 / dt:.0f} sweeps/s)")


if __name__ == "__main__":
    main()

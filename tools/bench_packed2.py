#!/usr/bin/env python
"""Experiment round 2: select-form packed kernels + MXU rate calibration.

For binary data, ym enters every formula only as a {0,1} indicator:
  p  = ym * (b*r)            ==  where(bit, inv_a, 0)
  q  = (1-ym) * (a*r)        ==  where(bit, 0, inv_b)
  ll = ym*log a +(1-ym)*log b == log(where(bit, a, b))
(bit-identical: multiplying by exact 0/1 and adding 0 is exact).  So the
kernel never materializes ym as float — just a boolean mask from the packed
words — and the loss needs ONE log instead of two.

Also times pure-MXU kernels (the matmuls alone) to calibrate today's f32 and
bf16 matmul rates on this chip.

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
from tools.bench_packed import pack_bits, time_fn

pltpu = ps.pltpu
_VMEM = ps._VMEM
_SMEM = ps._SMEM


def _bitmask(pw, bm):
    """(bmw, Np) int32 words -> (bm, Np) bool: bit of plane b for local row
    b*bmw + i.  Sign trick: left-shift bit b to the sign position, test < 0
    (2 ops/plane + concat + compare)."""
    planes = [(pw << (31 - b)) for b in range(32)]
    return jnp.concatenate(planes, axis=0) < 0


# ------------------------------------------- select-form packed H+loss pass
def hloss_packed2(W, H, Yp, *, eps=1e-8, block_m=256, mxu_dtype=None,
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
        bit = _bitmask(yp_ref[...], bm)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )
        a = wh + eps
        b = 1.0 - wh + eps
        r = 1.0 / (a * b)
        p = jnp.where(bit, b * r, 0.0)
        q = jnp.where(bit, 0.0, a * r)
        num_ref[...] += jax.lax.dot_general(
            w, p.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        den_ref[...] += jax.lax.dot_general(
            w, q.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        ll_ref[0, 0] += jnp.sum(jnp.log(jnp.where(bit, a, b)))

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
            transcendentals=Mp * Np,
        ),
        compiler_params=ps._resident_params(),
        interpret=interpret,
    )
    Num, Den, ll = call(W, H, Yp)
    return Num, Den, ll[0, 0]


# --------------------------------------------- select-form packed W pass
def w_packed2(W, H_new, Yp, *, n_real, eps=1e-8, block_m=256, mxu_dtype=None,
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
        bit = _bitmask(yp_ref[...], bm)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )
        a = wh + eps
        b = 1.0 - wh + eps
        r = 1.0 / (a * b)
        col = jax.lax.broadcasted_iota(jnp.int32, (bm, Np), 1)
        valid = col < n_real
        # p - q = where(bit, b*r, -(a*r)) on valid cols; q zero on pad cols.
        q = jnp.where(jnp.logical_and(jnp.logical_not(bit), valid), a * r, 0.0)
        pmq = jnp.where(bit, b * r, -q)
        t_ref[...] = jax.lax.dot_general(
            h, pmq.astype(mxu), (((1,), (1,)), ((), ())),
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


# --------------------------------------------------- MXU-only calibration
def mxu_only(W, H, X3, *, n_mm=3, block_m=256, mxu_dtype=None):
    """n_mm dependent matmuls per stripe, no VPU math, no data stream:
    wh = w^T h; o1 = w wh'; o2 = w wh'' — calibrates the MXU rate."""
    k, Mp = W.shape
    _, Np = H.shape
    bm = block_m
    grid = (Mp // bm,)
    acc = jnp.float32
    mxu = mxu_dtype or W.dtype

    def kernel(w_ref, h_ref, o1_ref, o2_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            o1_ref[...] = jnp.zeros(o1_ref.shape, o1_ref.dtype)
            o2_ref[...] = jnp.zeros(o2_ref.shape, o2_ref.dtype)

        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )
        o1_ref[...] += jax.lax.dot_general(
            w, wh.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        if n_mm >= 3:
            o2_ref[...] += jax.lax.dot_general(
                w, (wh + 1.0).astype(mxu), (((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
        else:
            o2_ref[...] += o1_ref[...]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((k, Np), W.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_mm * Mp * Np * k, bytes_accessed=0, transcendentals=0,
        ),
        compiler_params=ps._resident_params(),
    )
    return call(W, H)


def sweep_loop2(W0, H0, Yp, *, n_real, alpha, beta, eps=1e-8, block_m=256,
                mxu_dtype=None, iters=30):
    @jax.jit
    def loop(W, H, Yp):
        def body(_, carry):
            W, H, ll_acc = carry
            Num, Den, ll = hloss_packed2(
                W, H, Yp, eps=eps, block_m=block_m, mxu_dtype=mxu_dtype
            )
            num = H * Num + (alpha - 1.0)
            den = (1.0 - H) * Den + (beta - 1.0)
            H_new = jnp.clip(num / (num + den + eps), eps, 1.0 - eps)
            T = w_packed2(
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
    return (time.time() - t0) / iters * 1e3


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

    # correctness vs dense stripe kernels (exact)
    Ms, Ns, Ks, bms = 512, 640, 16, 256
    Ys = jnp.asarray((rng.random((Ms, Ns)) < 0.3), dtype=jnp.float32)
    Ws = jnp.asarray(rng.uniform(0.1, 0.9, (Ks, Ms)), dtype=jnp.float32)
    Ws = Ws / Ws.sum(axis=0, keepdims=True)
    Hs = jnp.asarray(rng.uniform(0.1, 0.9, (Ks, Ns)), dtype=jnp.float32)
    Yps = pack_bits(Ys, bms)
    n0, d0, l0 = ps.hloss_terms_stripe(Ws, Hs, Ys, m_real=Ms, n_real=Ns, block_m=bms)
    n1, d1, l1 = hloss_packed2(Ws, Hs, Yps, block_m=bms)
    t0_ = ps.w_terms_stripe(Ws, Hs, Ys, n_real=Ns, block_m=bms)
    t1_ = w_packed2(Ws, Hs, Yps, n_real=Ns, block_m=bms)
    print("hloss2 exact:", bool(jnp.all(n0 == n1)), bool(jnp.all(d0 == d1)),
          bool(l0 == l1), " wterms2 exact:", bool(jnp.all(t0_ == t1_)))

    bm = 256
    Mp = ps.round_up(M, 128)
    Np = ps.round_up(N, 128)
    Y = jnp.asarray((rng.random((Mp, Np)) < 0.3), dtype=jnp.float32)
    W = jnp.asarray(rng.uniform(0.1, 0.9, (K, Mp)), dtype=jnp.float32)
    W = W / W.sum(axis=0, keepdims=True)
    H = jnp.asarray(rng.uniform(0.1, 0.9, (K, Np)), dtype=jnp.float32)
    Yp = pack_bits(Y, bm)

    # MXU calibration
    time_fn(lambda W, H: mxu_only(W, H, None, n_mm=3, block_m=bm),
            (W, H), args.iters, "MXU-only 3 matmuls f32")
    time_fn(lambda W, H: mxu_only(W, H, None, n_mm=3, block_m=bm, mxu_dtype=jnp.bfloat16),
            (W, H), args.iters, "MXU-only 3 matmuls bf16")
    time_fn(lambda W, H: mxu_only(W, H, None, n_mm=2, block_m=bm),
            (W, H), args.iters, "MXU-only 2 matmuls f32")
    time_fn(lambda W, H: mxu_only(W, H, None, n_mm=2, block_m=bm, mxu_dtype=jnp.bfloat16),
            (W, H), args.iters, "MXU-only 2 matmuls bf16")

    # select-form packed passes
    time_fn(lambda W, H, Yp: hloss_packed2(W, H, Yp, block_m=bm),
            (W, H, Yp), args.iters, "packed2 hloss f32")
    time_fn(lambda W, H, Yp: w_packed2(W, H, Yp, n_real=N, block_m=bm),
            (W, H, Yp), args.iters, "packed2 wterms f32")
    time_fn(lambda W, H, Yp: hloss_packed2(W, H, Yp, block_m=bm, mxu_dtype=jnp.bfloat16),
            (W, H, Yp), args.iters, "packed2 hloss bf16-mxu")
    time_fn(lambda W, H, Yp: w_packed2(W, H, Yp, n_real=N, block_m=bm, mxu_dtype=jnp.bfloat16),
            (W, H, Yp), args.iters, "packed2 wterms bf16-mxu")

    for mxu, lbl in ((None, "f32"), (jnp.bfloat16, "bf16-mxu")):
        dt = sweep_loop2(W, H, Yp, n_real=N, alpha=1.2, beta=1.2, block_m=bm,
                         mxu_dtype=mxu, iters=args.iters)
        print(f"full packed2 sweep loop {lbl:10s} {dt:8.3f} ms/sweep "
              f"({1e3 / dt:.0f} sweeps/s)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Shape-sweep perf table: sweeps/s and % of the calibrated MXU roofline
across K and aspect ratios (VERDICT r3 item 5).

The headline bench measures ONE point (M=N=10^4, K=128).  This harness
proves the kernels are not tuned to that point: it sweeps the rank
K in {16, 64, 128, 256} at M=N=10^4 and the aspect ratio at a fixed
10^8-entry count (10^5 x 10^3 tall, 10^4 x 10^4 square, 10^3 x 10^5 wide —
tall/wide stress the stripe geometry and its VMEM-eligibility fallback
differently), recording for each shape:

- the library's own routing decision (bitpacked stripe kernels when
  ``select_stripe`` accepts the shape, dense tiled kernels otherwise —
  the same rule ``solve`` applies);
- slope-timed sweeps/s (two max_iter counts, median of pairwise slopes —
  cancels the 10-45 ms tunneled dispatch constant, see bench.py);
- %% of TWO matmul rooflines: each sweep runs 6 (m, n, k)-class matmuls
  (docs/performance.md "corrected roofline").  ``pct_of_mxu_roofline``
  uses the absolute floor ``12*M*N*K / rate`` at the session-calibrated
  f32-DEFAULT MXU rate (hoist-proof 4096^3 matmul slope, remeasured every
  run rather than quoting the 92 TF/s doc figure) — at small K this is
  unreachable by ANY implementation (a K=16 contraction cannot fill the
  128-deep MXU).  ``pct_of_matmul_floor`` therefore also slope-times 6
  plain XLA matmuls of the SAME (Mp, K)x(K, Np) shape per config — the
  floor a perfect kernel could actually hit at that K — separating
  kernel quality from hardware K-geometry.

Writes ``outputs/shape_sweep_tpu.csv``.  Run on the TPU host::

    python tools/bench_shapes.py
"""

from __future__ import annotations

import csv
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / "outputs" / "shape_sweep_tpu.csv"

# (name, M, N, K); sweep counts are sized per-shape from the roofline.
CONFIGS = [
    ("k16", 10_000, 10_000, 16),
    ("k64", 10_000, 10_000, 64),
    ("k128", 10_000, 10_000, 128),
    ("k256", 10_000, 10_000, 256),
    ("tall_1e5x1e3", 100_000, 1_000, 128),
    ("wide_1e3x1e5", 1_000, 100_000, 128),
]


def _sized_matmul_slope(jax, jnp, A, B, tiny=False):
    """Median slope (s/iter) of a hoist-proof A@B loop, with the iteration
    delta sized so >=1.5 s of device time separates the two counts — the
    10-45 ms variable per-dispatch cost must be noise against the delta
    (docs/performance.md "Measurement methodology").

    Hoist-proofing: the loop threads ``max(C)`` back into the carry.  A
    full reduction cannot be narrowed into the dot — threading ``C[0, 0]``
    let XLA rewrite the whole matmul to a single row-column dot product
    (the round-5 run "calibrated" 5104.9 TF/s that way).  The price is one
    read of C per iteration, which a real unfused consumer also pays; at
    the calibration shape (4096^3: 64 MB read vs ~1.5 ms of MXU work) it
    biases the rate <~5 % conservative.  The trip count is a traced
    argument (fori_loop -> while_loop), so sizing probes reuse ONE
    compiled executable instead of recompiling per count."""

    @jax.jit
    def loop(A, B, n):
        def body(_, Ai):
            C = Ai @ B
            return Ai + jnp.max(C) * 1e-30

        return jax.lax.fori_loop(0, n, body, A)

    def run(iters):
        t0 = time.perf_counter()
        float(loop(A, B, jnp.int32(iters))[0, 0])
        return time.perf_counter() - t0

    run(1)  # compile once
    if tiny:
        lo, hi = 2, 6
    else:
        # Stage 1: doubling search for a per-iter estimate good enough to
        # size the delta (dispatch cost <= ~9 % of a 0.5 s probe).
        iters, t = 64, run(64)
        while t < 0.5 and iters < 1_000_000:
            iters *= 4 if t < 0.1 else 2
            t = run(iters)
        est = max(t / iters, 1e-9)
        # Stage 2: size the delta from the estimate, >=1.5 s device time.
        delta = max(int(1.5 / est), 40)
        lo = max(10, delta // 4)
        hi = lo + delta
    run(lo)
    run(hi)
    slopes = []
    for _ in range(5):
        t_lo = run(lo)
        t_hi = run(hi)
        slopes.append((t_hi - t_lo) / (hi - lo))
    return statistics.median(slopes)


def calibrate_mxu_tf(jax, jnp, S=4096, tiny=False):
    """Session f32-DEFAULT MXU rate from a hoist-proof S^3 matmul slope."""
    A = jax.random.uniform(jax.random.PRNGKey(0), (S, S), jnp.float32)
    B = jax.random.uniform(jax.random.PRNGKey(1), (S, S), jnp.float32)
    sec = _sized_matmul_slope(jax, jnp, A, B, tiny=tiny)
    return 2 * S**3 / sec / 1e12


def matmul_floor_ms(jax, jnp, Mp, K, Np, tiny=False):
    """Slope-timed seconds of ONE (Mp, K) @ (K, Np) f32-DEFAULT XLA matmul
    (hoist-proof, delta sized to >=1.5 s device time), scaled to the
    sweep's 6-matmul floor in ms."""
    A = jax.random.uniform(jax.random.PRNGKey(2), (Mp, K), jnp.float32)
    B = jax.random.uniform(jax.random.PRNGKey(3), (K, Np), jnp.float32)
    return 6e3 * _sized_matmul_slope(jax, jnp, A, B, tiny=tiny)


def main():
    from experiments._env import force_platform

    force_platform(os.environ.get("NBMF_PLATFORM", "tpu"))
    import jax
    import jax.numpy as jnp

    from nbmf_mm_tpu.ops import pallas_sweep as ps
    from nbmf_mm_tpu.solver.driver import _solve_core_pallas
    from nbmf_mm_tpu.utils import enable_compilation_cache

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:  # TPU-only: CPU AOT cache entries embed host CPU features
        enable_compilation_cache()
    # NBMF_SHAPES_TINY=1: CPU interpret-mode smoke of the harness itself
    # (shapes shrunk; timings meaningless, CSV not written).
    tiny = os.environ.get("NBMF_SHAPES_TINY") == "1"
    assert on_tpu or tiny, (
        "bench_shapes.py measures the real chip; set NBMF_PLATFORM=tpu "
        "(or NBMF_SHAPES_TINY=1 for a CPU smoke run)"
    )
    global CONFIGS
    if tiny:
        CONFIGS = [(n, max(M // 64, 512), max(N // 64, 512), min(K, 16))
                   for n, M, N, K in CONFIGS[:2] + CONFIGS[-2:]]

    tf_rate = calibrate_mxu_tf(jax, jnp, S=512 if tiny else 4096, tiny=tiny)
    print(f"calibrated f32-DEFAULT MXU rate: {tf_rate:.1f} TF/s", flush=True)

    rows = []
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    for name, M, N, K in CONFIGS:
        Mp = ps.round_up(M, 512)
        Np = ps.round_up(N, 512)
        kpack = jax.random.PRNGKey(42)
        kw0, kh0 = jax.random.split(jax.random.PRNGKey(7))
        # Zero-padding contract (pad_operands / _solve_core_pallas): draw
        # W0/H0 at the REAL shapes, normalize, then zero-pad — the packed
        # kernels rely on zero pad rows of Y and zero W/H pad columns, so
        # the losses and the MM-descent guard match what solve() computes.
        W0 = jax.random.uniform(kw0, (K, M), jnp.float32, 0.1, 0.9)
        W0 = W0 / W0.sum(axis=0, keepdims=True)
        W0 = jnp.pad(W0, ((0, 0), (0, Mp - M)))
        H0 = jnp.pad(
            jax.random.uniform(kh0, (K, N), jnp.float32, 0.1, 0.9),
            ((0, 0), (0, Np - N)),
        )

        can_pack, bm = ps.select_stripe(K, Mp, Np, 1, packed=True)
        if can_pack:
            routing = f"packed-stripe(bm={bm})"

            @jax.jit
            def mk_packed():
                def chunk(i, acc):
                    y = (
                        jax.random.uniform(jax.random.fold_in(kpack, i), (bm, Np))
                        < 0.3
                    ).astype(jnp.float32)
                    # zero the pad rows/cols (rows >= M, cols >= N)
                    row = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, Np), 0)
                    col = jax.lax.broadcasted_iota(jnp.int32, (bm, Np), 1)
                    y = jnp.where((row < M) & (col < N), y, 0.0)
                    return jax.lax.dynamic_update_slice(
                        acc, ps.pack_bits(y, bm), (i * (bm // 32), 0)
                    )

                return jax.lax.fori_loop(
                    0, Mp // bm, chunk, jnp.zeros((Mp // 32, Np), jnp.int32)
                )

            Ydev = mk_packed()
        else:
            routing = "dense-tiled"

            @jax.jit
            def mk_dense():
                def chunk(i, acc):
                    y = (
                        jax.random.uniform(
                            jax.random.fold_in(kpack, i), (512, Np)
                        )
                        < 0.3
                    ).astype(jnp.float32)
                    row = i * 512 + jax.lax.broadcasted_iota(
                        jnp.int32, (512, Np), 0
                    )
                    col = jax.lax.broadcasted_iota(jnp.int32, (512, Np), 1)
                    y = jnp.where((row < M) & (col < N), y, 0.0)
                    return jax.lax.dynamic_update_slice(acc, y, (i * 512, 0))

                return jax.lax.fori_loop(
                    0, Mp // 512, chunk, jnp.zeros((Mp, Np), jnp.float32)
                )

            Ydev = mk_dense()
        Ydev.block_until_ready()

        args = (
            Ydev, None, None, W0, H0,
            f32(1.2), f32(1.2), f32(0.0), f32(M * N),
        )
        kw = dict(
            projection="normalize", verbose=0, eps=1e-8,
            m_real=M, n_real=N,
            block_m=ps.DEFAULT_BLOCK, block_n=ps.DEFAULT_BLOCK,
            packed=can_pack, interpret=not on_tpu,
        )

        floor_ms = 12.0 * M * N * K / (tf_rate * 1e12) * 1e3
        # Size the sweep delta so it dominates dispatch noise (~45 ms):
        # target >= 1.5 s of device time between the two counts.
        delta = int(np.clip(1500.0 / max(floor_ms, 1e-3), 40, 4000))
        lo, hi = max(10, delta // 4), max(10, delta // 4) + delta
        if tiny:
            lo, hi = 2, 6

        def sync(out):
            return float(np.asarray(out[4]).sum())

        sync(_solve_core_pallas(*args, **dict(kw, max_iter=lo)))
        out = _solve_core_pallas(*args, **dict(kw, max_iter=hi))
        sync(out)
        slopes = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(_solve_core_pallas(*args, **dict(kw, max_iter=lo)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync(_solve_core_pallas(*args, **dict(kw, max_iter=hi)))
            t_hi = time.perf_counter() - t0
            slopes.append((t_hi - t_lo) / (hi - lo))
        slope = statistics.median(slopes)
        if slope <= 0:
            raise RuntimeError(f"{name}: non-positive slope {slope}")
        out_losses = np.asarray(out[2], dtype=np.float64)[: int(np.asarray(out[3]))]
        if not np.all(np.isfinite(out_losses)):
            raise RuntimeError(f"{name}: non-finite losses")
        if np.max(np.diff(out_losses)) > 2e-3:
            raise RuntimeError(f"{name}: MM descent violated")

        mm_floor = matmul_floor_ms(jax, jnp, Mp, K, Np, tiny=tiny)
        row = dict(
            config=name, M=M, N=N, K=K, routing=routing,
            sweeps_per_sec=round(1.0 / slope, 2),
            ms_per_sweep=round(1e3 * slope, 3),
            mxu_roofline_ms=round(floor_ms, 3),
            pct_of_mxu_roofline=round(100.0 * floor_ms / (1e3 * slope), 1),
            matmul_floor_ms=round(mm_floor, 3),
            pct_of_matmul_floor=round(100.0 * mm_floor / (1e3 * slope), 1),
            mxu_tf_s=round(tf_rate, 1),
            sweeps_timed=f"{lo}/{hi}",
            device=str(jax.devices()[0]),
        )
        rows.append(row)
        print(row, flush=True)
        del Ydev, W0, H0, args

    if tiny:
        print("tiny smoke OK (no CSV written)")
        return
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: MM sweep throughput at M=N=10^4, K=128 (f32) on one
TPU chip, versus the reference's NumPy/BLAS CPU implementation (f64, as the
reference's sklearn validation forces — `_base.py:83`).

Prints ONE JSON line:
  {"metric": ..., "value": sweeps/s, "unit": "sweeps/s", "vs_baseline": ratio}

The measured unit of work is one full solver iteration — H update, W update,
objective, convergence test — executed inside the compiled `lax.while_loop`
(tol=0 so no early exit), i.e. exactly what `NBMF.fit` runs per iteration.

Baseline: a from-scratch NumPy expression of the same sweep+loss math, probed
at 2500x2500 and scaled linearly to 10^4x10^4 (conservative: BLAS gets
relatively *slower* at full size — measured 45.75 s/sweep full vs 33.6 s/sweep
implied by the probe on the dev host).  Set NBMF_BENCH_FULL_BASELINE=1 to
measure the full-size baseline directly (~1 min).
"""

import json
import os
import sys
import time

import numpy as np

M = N = int(os.environ.get("NBMF_BENCH_MN", 10000))
K = int(os.environ.get("NBMF_BENCH_K", 128))
SWEEPS = int(os.environ.get("NBMF_BENCH_SWEEPS", 50))
PROBE = 2500


def numpy_baseline_sweep_seconds(full: bool = False) -> float:
    """Reference-equivalent NumPy sweep+loss (f64), seconds per sweep at MxN."""
    eps, a, b = 1e-8, 1.2, 1.2
    size = M if full else PROBE

    rng = np.random.default_rng(0)
    Y = (rng.random((size, size)) < 0.3).astype(np.float64)
    W = rng.uniform(0.1, 0.9, (K, size))
    W /= W.sum(0, keepdims=True)
    H = rng.uniform(0.1, 0.9, (K, size))

    def sweep(W, H):
        WH = W.T @ H
        num = H * (W @ (Y / (WH + eps))) + (a - 1)
        den = (1 - H) * (W @ ((1 - Y) / (1 - WH + eps))) + (b - 1)
        Hn = np.clip(num / (num + den + eps), eps, 1 - eps)
        WHn = W.T @ Hn
        T = Hn @ (Y / (WHn + eps)).T + (1 - Hn) @ ((1 - Y) / (1 - WHn + eps)).T
        Wn = W * T / size
        Wn /= Wn.sum(0, keepdims=True)
        WH2 = Wn.T @ Hn
        ll = (Y * np.log(WH2 + eps) + (1 - Y) * np.log(1 - WH2 + eps)).sum()
        loss = -(ll + (a - 1) * np.log(Hn + eps).sum() + (b - 1) * np.log(1 - Hn + eps).sum()) / Y.size
        return Wn, Hn, loss

    sweep(W, H)  # warm BLAS
    reps = 1 if full else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        W, H, _ = sweep(W, H)
    dt = (time.perf_counter() - t0) / reps
    if not full:
        dt *= (M * N) / (PROBE * PROBE)  # linear scaling (conservative)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from nbmf_mm_tpu.ops.updates import precompute_masked_terms
    from nbmf_mm_tpu.solver.driver import _solve_core

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    Y = jnp.asarray((rng.random((M, N)) < 0.3), dtype=jnp.float32)
    W0 = jnp.asarray(rng.uniform(0.1, 0.9, (K, M)), dtype=jnp.float32)
    W0 = W0 / W0.sum(axis=0, keepdims=True)
    H0 = jnp.asarray(rng.uniform(0.1, 0.9, (K, N)), dtype=jnp.float32)
    Ym, Ym2, Yc = precompute_masked_terms(Y, None)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    args = (
        Ym, Ym2, Yc, W0, H0,
        f32(1.2), f32(1.2), f32(0.0), f32(1e-8), f32(M * N), f32(N),
    )
    kw = dict(max_iter=SWEEPS, projection="normalize",
              precision=jax.lax.Precision.HIGHEST, verbose=0)

    out = _solve_core(*args, **kw)  # compile + warm up
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = _solve_core(*args, **kw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    losses = np.asarray(out[2])
    assert int(out[3]) == SWEEPS
    assert np.all(np.isfinite(losses)), "non-finite losses in bench run"
    assert np.all(np.diff(losses) <= 1e-5), "MM descent violated in bench run"

    sweeps_per_sec = SWEEPS / dt
    base_dt = numpy_baseline_sweep_seconds(os.environ.get("NBMF_BENCH_FULL_BASELINE") == "1")
    baseline_sweeps_per_sec = 1.0 / base_dt

    print(json.dumps({
        "metric": f"mm_sweeps_per_sec_M{M}_N{N}_K{K}_f32",
        "value": round(sweeps_per_sec, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_sec / baseline_sweeps_per_sec, 2),
        "baseline_sweeps_per_sec": round(baseline_sweeps_per_sec, 5),
        "device": str(dev),
        "final_loss": float(losses[-1]),
    }))


if __name__ == "__main__":
    sys.exit(main())

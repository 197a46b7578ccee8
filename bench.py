#!/usr/bin/env python
"""Headline benchmark: MM sweep throughput at M=N=10^4, K=128 on one TPU
chip, versus the reference's NumPy/BLAS CPU implementation (f64, as the
reference's sklearn validation forces — `_base.py:83`).

Prints ONE JSON line:
  {"metric": ..., "value": sweeps/s, "unit": "sweeps/s", "vs_baseline": ratio}

The measured unit of work is one full solver iteration — H update, W update,
objective, convergence test — executed inside the compiled `lax.while_loop`
(tol=0 so no early exit), i.e. exactly what `NBMF.fit` runs per iteration.

The headline `value` is the fused-Pallas f32 path (the library's default on
TPU).  Supplementary keys report the XLA path and the bf16-data Pallas path
(bf16 storage is lossless for binary data; factors/accumulation stay f32).

Baseline: a from-scratch NumPy expression of the same sweep+loss math (f64),
measured at full size on this host (one sweep, ~45 s on the single-core dev
host).  Set NBMF_BENCH_PROBE_BASELINE=1 to use a fast 2500x2500 probe scaled
linearly instead (optimistic for NumPy, i.e. conservative for the ratio).

Timing note (methodology, round 2): one jitted call through the axon tunnel
carries a LARGE, VARIABLE fixed dispatch cost (measured 10-45 ms on the same
session), so `total_time / n_sweeps` at a single sweep count systematically
under-reports throughput.  Each variant is therefore timed at TWO sweep
counts and the reported value is the SLOPE — (t_hi - t_lo) / (hi - lo) —
which cancels the dispatch constant exactly.  Device completion is enforced
by pulling a scalar result to the host (float(...)) — `block_until_ready`
alone under-reports on this backend.  (Also note for microbenchmarks: a
timing loop must thread each iteration's output into the next iteration's
input, or XLA hoists the loop-invariant kernel call and the loop measures
nothing — see tools/bench_true.py.)
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
# Default run: headline (Pallas f32 on TPU / XLA on CPU) + full-size NumPy
# baseline, ~3-4 min total.  NBMF_BENCH_FULL=1 adds the bf16 and XLA
# variants (two more ~60-90s tunnel compiles).
FULL = os.environ.get("NBMF_BENCH_FULL") == "1"


def numpy_baseline_sweep_seconds(full: bool = True) -> float:
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


def _time_variant(fn, args, kw):
    """Slope-based steady-state timing with forced host sync.

    Times the compiled solver at SWEEPS and 3*SWEEPS iterations and reports
    the per-sweep slope (cancels the per-dispatch constant of the tunneled
    device).  Primary estimator: MEDIAN of 5 per-round pairwise slopes —
    stable when the sweep delta dominates the dispatch noise (the headline
    size).  If the median comes out non-positive (sweeps too fast for this
    tunnel's variance), fall back to a min-per-count slope over more
    repeats, and raise rather than report a bogus number if even that is
    non-positive.  Returns (sweeps_per_sec, losses) and validates MM
    descent on the long run.
    """
    import statistics

    def sync(out):
        # Works for the single-init (scalar final loss) and the vmapped
        # n_init-batched cores ((b,) final losses) alike.
        return float(np.asarray(out[4]).sum())

    lo, hi = SWEEPS, 3 * SWEEPS
    kw_lo = dict(kw, max_iter=lo)
    kw_hi = dict(kw, max_iter=hi)
    out = fn(*args, **kw_lo)
    sync(out)  # materialize => device completed (compile lo)
    out = fn(*args, **kw_hi)
    sync(out)  # compile hi

    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*args, **kw_lo)
        sync(r)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(*args, **kw_hi)
        sync(out)
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (hi - lo))
    slope = statistics.median(slopes)
    if slope <= 0:
        t_lo = t_hi = np.inf
        for _ in range(6):
            t0 = time.perf_counter()
            r = fn(*args, **kw_lo)
            sync(r)
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            out = fn(*args, **kw_hi)
            sync(out)
            t_hi = min(t_hi, time.perf_counter() - t0)
        slope = (t_hi - t_lo) / (hi - lo)
    if slope <= 0:
        raise RuntimeError(
            f"non-positive timing slope ({slope:.3g}s/sweep): dispatch "
            "variance exceeds the sweep time at this problem size — raise "
            "NBMF_BENCH_MN/NBMF_BENCH_SWEEPS"
        )
    losses = np.asarray(out[2], dtype=np.float64)
    if not np.all(np.asarray(out[3]) == hi):
        raise RuntimeError(f"bench ran {np.asarray(out[3])} sweeps, expected {hi}")
    if not np.all(np.isfinite(losses)):
        raise RuntimeError("non-finite losses in bench run")
    if not np.all(np.diff(losses, axis=-1) <= 1e-4):
        raise RuntimeError("MM descent violated in bench run")
    return 1.0 / slope, losses


def _wait_for_device():
    """Bounded retry for the tunneled-TPU relay: a dead relay fails backend
    init instantly (`RuntimeError: Unable to initialize backend 'axon'`),
    and nothing in-VM can restart it — but outages are often transient, so
    probe in a CLEAN subprocess (backend-init failures can stick to a
    process) every 30 s for up to NBMF_BENCH_WAIT_DEVICE_S (default 3600 —
    round-3's 900 s window was shorter than a real relay outage and turned
    an environment failure into a red round artifact; the probes are cheap
    30 s-interval subprocesses, so waiting longer costs nothing) before
    letting the real run proceed/fail.  A probe that *hangs* is not
    retried: a half-dead relay is not improved by piling probes onto it.
    """
    import subprocess

    timeout_s = float(os.environ.get("NBMF_BENCH_WAIT_DEVICE_S", "3600"))
    deadline = time.time() + timeout_s
    attempt = 0
    while True:
        try:
            # Forcing a platform needs the env var AND the config update
            # (the axon sitecustomize may pre-import jax) — mirror whatever
            # platform this process was asked to run on.
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import os, jax\n"
                 "p = os.environ.get('JAX_PLATFORMS')\n"
                 "_ = p and jax.config.update('jax_platforms', p)\n"
                 "jax.devices()"],
                capture_output=True, timeout=240,
            )
            err = probe.stderr.decode(errors="replace")[-2000:]
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            # A HUNG probe means the relay is half-dead, not down: killing
            # more probes mid-backend-claim risks wedging the device lease
            # (CLAUDE.md), so do NOT retry — proceed and let the real run
            # take its one chance.
            sys.stderr.write("bench: device probe hung >240 s; proceeding\n")
            return
        if ok:
            if attempt:
                sys.stderr.write(f"bench: device back after {attempt} retries\n")
            return
        attempt += 1
        if time.time() >= deadline:
            # Out of patience: let the real run try (and fail loudly with
            # its own error if the relay is still gone).
            sys.stderr.write(
                f"bench: device still unavailable after {attempt} probes "
                f"over {timeout_s:.0f}s; proceeding\n" + err
            )
            return
        sys.stderr.write(
            f"bench: device probe {attempt} failed; retrying in 30 s\n"
        )
        time.sleep(30)


def main():
    _wait_for_device()
    import jax

    # Same both-places platform forcing as the probe (and conftest.py):
    # with the relay down, backend discovery hangs without it even when
    # JAX_PLATFORMS=cpu is in the environment.
    _plat = os.environ.get("JAX_PLATFORMS")
    if _plat:
        jax.config.update("jax_platforms", _plat)
    import jax.numpy as jnp

    from nbmf_mm_tpu.ops import pallas_sweep as ps
    from nbmf_mm_tpu.ops.updates import precompute_masked_terms
    from nbmf_mm_tpu.solver.driver import _solve_core, _solve_core_pallas
    from nbmf_mm_tpu.utils import enable_compilation_cache

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        # Persistent compile cache: the timed quantity is the warm slope, so
        # caching only removes the ~60-90 s tunnel compiles per variant —
        # shrinking the window in which a relay flap can kill the round's
        # perf artifact.  TPU-only: executables are keyed to the TPU target;
        # XLA:CPU AOT entries embed host CPU features and can SIGILL when
        # this VM migrates hosts between sessions.
        enable_compilation_cache()
    rng = np.random.default_rng(0)
    Y = jnp.asarray((rng.random((M, N)) < 0.3), dtype=jnp.float32)
    W0 = jnp.asarray(rng.uniform(0.1, 0.9, (K, M)), dtype=jnp.float32)
    W0 = W0 / W0.sum(axis=0, keepdims=True)
    H0 = jnp.asarray(rng.uniform(0.1, 0.9, (K, N)), dtype=jnp.float32)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)

    results = {}

    if on_tpu:
        # Unmasked staging: only Y itself is padded (pad_operands ignores
        # the complement when masked=False; the kernels synthesize it
        # in-register), so the default packed run holds 12.5 MB of words
        # instead of ~1.2 GB of dense operands.
        Ymp, Ym2p, Ycp, W0p, H0p, _ = ps.pad_operands(
            Y, None, None, W0, H0, masked=False
        )
        pargs = (Ym2p, Ycp, W0p, H0p, f32(1.2), f32(1.2), f32(0.0), f32(M * N))
        pkw = dict(
            max_iter=SWEEPS, projection="normalize", verbose=0, eps=1e-8,
            m_real=M, n_real=N, block_m=ps.DEFAULT_BLOCK, block_n=ps.DEFAULT_BLOCK,
        )
        # Headline = the library's default fit path on binary data: the
        # bitpacked stripe kernels (solve() auto-packs; bit-identical math).
        Mp, Np = Ymp.shape
        can_pack, pack_bm = ps.select_stripe(K, Mp, Np, 1, packed=True)
        if not can_pack:
            raise RuntimeError("bench shapes are not pack-eligible")
        Ypk = jax.jit(ps.pack_bits, static_argnums=1)(Ymp, pack_bm)
        if not FULL:
            Ymp = Y = None  # free the two dense 400 MB copies on-device
        results["pallas_f32"], losses = _time_variant(
            _solve_core_pallas, (Ypk,) + pargs, dict(pkw, packed=True)
        )

        # Batched-restart throughput (BASELINE.json target: "n_init=16
        # vmapped into one batched solve") at the headline size: the whole
        # compiled loop vmapped over 16 restarts sharing one packed data
        # stream.  Reported as AGGREGATE restart-sweeps/s (16 x the batched
        # solve's sweep rate) — near the single-fit rate means restart
        # batching is HBM-stream-bound, not scheduling-bound.
        B16 = int(os.environ.get("NBMF_BENCH_NINIT", 16))
        if B16 > 0:
            from functools import partial as _partial

            kb_w, kb_h = jax.random.split(jax.random.PRNGKey(123))
            W16 = jax.random.uniform(
                kb_w, (B16, K, M), jnp.float32, 0.1, 0.9
            )
            W16 = W16 / W16.sum(axis=1, keepdims=True)
            W16 = jnp.pad(W16, ((0, 0), (0, 0), (0, Mp - M)))
            H16 = jnp.pad(
                jax.random.uniform(kb_h, (B16, K, N), jnp.float32, 0.1, 0.9),
                ((0, 0), (0, 0), (0, Np - N)),
            )
            pkw16 = dict(pkw, packed=True)

            def run16(*a, max_iter):
                core = _partial(
                    _solve_core_pallas, **dict(pkw16, max_iter=max_iter)
                )
                return jax.vmap(
                    core,
                    in_axes=(None, None, None, 0, 0, None, None, None, None),
                )(*a)

            args16 = (Ypk, None, None, W16, H16) + pargs[4:]
            rate16, _ = _time_variant(run16, args16, {})
            results["n_init16"] = rate16 * B16
            del W16, H16

        if FULL:
            results["pallas_f32_dense"], _ = _time_variant(
                _solve_core_pallas, (Ymp,) + pargs, pkw
            )
            results["pallas_bf16"], _ = _time_variant(
                _solve_core_pallas, (Ymp.astype(jnp.bfloat16),) + pargs, pkw
            )
            # True-f32 MXU products (docs/performance.md "MXU precision
            # tiers"): what precision="highest" costs at headline size.
            results["pallas_f32_highest"], _ = _time_variant(
                _solve_core_pallas,
                (Ypk,) + pargs,
                dict(pkw, packed=True,
                     mxu_precision=jax.lax.Precision.HIGHEST),
            )

        if os.environ.get("NBMF_BENCH_FLAGSHIP", "1") == "1" and M == 10000:
            # Flagship scale (BASELINE.json stretch target): 10^5 x 10^4 =
            # 10^9 entries, bitpacked (122.5 MB of words vs 4 GB dense f32).
            # Slope-timed over max_iter like every other variant; companion
            # to outputs/flagship_scale_tpu.csv (which adds convergence and
            # quality).  The dense bf16 equivalent ran 174 ms/sweep under
            # HBM pressure; packed runs at the 6-matmul MXU floor.
            Mf = 100_000
            Mfp = ps.round_up(Mf, 512)
            okf, bmf = ps.select_stripe(K, Mfp, Np, 1, packed=True)
            assert okf, "flagship shape must be pack-eligible"
            kf = jax.random.PRNGKey(7)
            Wf = jax.random.uniform(
                jax.random.fold_in(kf, 1), (K, Mfp), jnp.float32, 0.1, 0.9
            )
            Wf = Wf / Wf.sum(axis=0, keepdims=True)
            Hf = jax.random.uniform(
                jax.random.fold_in(kf, 2), (K, Np), jnp.float32, 0.1, 0.9
            )

            @jax.jit
            def _mk_packed_flagship():
                def chunk(i, acc):
                    y = (
                        jax.random.uniform(jax.random.fold_in(kf, 100 + i), (bmf, Np))
                        < 0.3
                    ).astype(jnp.float32)
                    return jax.lax.dynamic_update_slice(
                        acc, ps.pack_bits(y, bmf), (i * (bmf // 32), 0)
                    )
                return jax.lax.fori_loop(
                    0, Mfp // bmf, chunk, jnp.zeros((Mfp // 32, Np), jnp.int32)
                )

            Ypkf = _mk_packed_flagship()
            fkw = dict(pkw, packed=True, m_real=Mf)
            fargs = (
                Ypkf, None, None, Wf, Hf,
                f32(1.2), f32(1.2), f32(0.0), f32(Mf * N),
            )
            lo_hi = (6, 26)
            times = {c: np.inf for c in lo_hi}
            for c in lo_hi:  # compile both counts
                float(np.asarray(_solve_core_pallas(
                    *fargs, **dict(fkw, max_iter=c))[4]))
            for _ in range(3):
                for c in lo_hi:
                    t0 = time.perf_counter()
                    float(np.asarray(_solve_core_pallas(
                        *fargs, **dict(fkw, max_iter=c))[4]))
                    times[c] = min(times[c], time.perf_counter() - t0)
            f_slope = (times[lo_hi[1]] - times[lo_hi[0]]) / (lo_hi[1] - lo_hi[0])
            results["flagship_1e9_ms_per_sweep"] = 1000 * f_slope
            del Ypkf, Wf, Hf

    if not on_tpu or FULL:
        Ym, Ym2, Yc = precompute_masked_terms(Y, None)
        jargs = (
            Ym, Ym2, Yc, W0, H0,
            f32(1.2), f32(1.2), f32(0.0), f32(1e-8), f32(M * N), f32(N),
        )
        jkw = dict(max_iter=SWEEPS, projection="normalize",
                   precision=jax.lax.Precision.HIGHEST, verbose=0)
        results["xla_f32"], xla_losses = _time_variant(_solve_core, jargs, jkw)
        if not on_tpu:
            losses = xla_losses

    headline = results.get("pallas_f32", results.get("xla_f32"))
    base_dt = numpy_baseline_sweep_seconds(
        full=os.environ.get("NBMF_BENCH_PROBE_BASELINE") != "1"
    )
    baseline_sweeps_per_sec = 1.0 / base_dt

    print(json.dumps({
        "metric": f"mm_sweeps_per_sec_M{M}_N{N}_K{K}_f32",
        "value": round(headline, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(headline / baseline_sweeps_per_sec, 2),
        "baseline_sweeps_per_sec": round(baseline_sweeps_per_sec, 5),
        "device": str(dev),
        "final_loss": float(losses[-1]),
        **{k: round(v, 3) for k, v in results.items()},
    }))


if __name__ == "__main__":
    sys.exit(main())

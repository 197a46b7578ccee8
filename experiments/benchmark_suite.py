#!/usr/bin/env python
"""Benchmark suite over the BASELINE.md configurations.

Produces a machine-readable table (CSV + stdout) of fit quality and timing
for the paper datasets and synthetic configs, comparable against the
reference numbers recorded in BASELINE.md:

- paper datasets at their figure-2 configs (test perplexity, iters, time);
- the README-quickstart synthetic config;
- an MM-sweep throughput probe (compiled loop, tol=0) at configurable size.

Usage: python experiments/benchmark_suite.py [--platform cpu|tpu]
       [--mn 2000] [--sweeps 20] [--outdir outputs]
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments._env import force_platform  # noqa: E402


def dataset_rows(dtype):
    from experiments.data import compute_perplexity, load_dataset_and_splits
    from experiments.reproduce_magron2022 import FIG2_PARAMS, SEED
    from nbmf_mm_tpu import NBMF

    rows = []
    for ds, p in FIG2_PARAMS.items():
        Y, train_mask, _, test_mask = load_dataset_and_splits(ds)
        model = NBMF(
            n_components=p["k"], alpha=p["alpha"], beta=p["beta"],
            max_iter=1000, tol=1e-5, random_state=SEED, dtype=dtype,
        )
        t0 = time.time()
        model.fit(Y, mask=train_mask)
        wall = time.time() - t0
        # second fit = steady-state (compile cached)
        t0 = time.time()
        model.fit(Y, mask=train_mask)
        warm = time.time() - t0
        pplx = compute_perplexity(Y, model.W_ @ model.components_, test_mask)
        rows.append({
            "config": f"{ds} K={p['k']} a={p['alpha']} b={p['beta']}",
            "test_perplexity": round(pplx, 4),
            "n_iter": model.n_iter_,
            "fit_time_cold_s": round(wall, 3),
            "fit_time_warm_s": round(warm, 3),
        })
        print(rows[-1], flush=True)
    return rows


def quickstart_row(dtype):
    """README-quickstart config: synthetic binary 100x500, K=6, beta-dir."""
    from nbmf_mm_tpu import NBMF

    rng = np.random.default_rng(0)
    X = (rng.random((100, 500)) < 0.3).astype(float)
    model = NBMF(n_components=6, random_state=0, dtype=dtype)
    t0 = time.time()
    model.fit(X)
    row = {
        "config": "synthetic 100x500 K=6 (quickstart)",
        "test_perplexity": round(float(np.exp(model.loss_)), 4),
        "n_iter": model.n_iter_,
        "fit_time_cold_s": round(time.time() - t0, 3),
        "fit_time_warm_s": None,
    }
    print(row, flush=True)
    return [row]


def throughput_row(mn, k, sweeps):
    """Compiled-loop sweep throughput at mn x mn, rank k (tol=0).

    The input is placed on the device first: through a tunneled chip a host
    array re-transfers per call (tens of MB over HTTP), which would swamp
    the sweep time being measured.
    """
    import jax
    import jax.numpy as jnp

    from nbmf_mm_tpu import solve

    rng = np.random.default_rng(0)
    Y = jax.device_put(jnp.asarray(
        (rng.random((mn, mn)) < 0.3).astype(np.float32)
    ))
    r = solve(Y, k, max_iter=sweeps, tol=0.0, random_state=0, dtype="float32")
    t0 = time.time()
    r = solve(Y, k, max_iter=sweeps, tol=0.0, random_state=0, dtype="float32")
    dt = (time.time() - t0) / sweeps
    row = {
        "config": f"throughput {mn}x{mn} K={k} f32",
        "test_perplexity": None,
        "n_iter": sweeps,
        "fit_time_cold_s": round(dt, 5),
        "fit_time_warm_s": round(1.0 / dt, 2),  # sweeps/s
    }
    print(f"throughput: {1.0/dt:.2f} sweeps/s ({dt*1e3:.2f} ms/sweep)", flush=True)
    return [row]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--mn", type=int, default=2000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--sweeps", type=int, default=20)
    ap.add_argument("--outdir", type=Path, default=Path(__file__).parent.parent / "outputs")
    args = ap.parse_args(argv)
    platform = force_platform(args.platform)
    dtype = None if platform == "cpu" else "float32"

    rows = dataset_rows(dtype) + quickstart_row(dtype) + throughput_row(
        args.mn, args.k, args.sweeps
    )
    args.outdir.mkdir(parents=True, exist_ok=True)
    # normalize backend aliases (axon = tunneled TPU) for the artifact name
    out = args.outdir / f"benchmark_suite_{'tpu' if platform in ('axon', 'tpu') else platform}.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

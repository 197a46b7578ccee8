#!/usr/bin/env python
"""Reproduce the Magron & Fevotte (2022) experiments on the TPU-native stack.

Re-architecture of the reference driver (``examples/reproduce_magron2022.py``):

- **Figure 1** (hyperparameter validation): the 6x6 (alpha, beta) grid runs as
  ONE batched, vmapped solve per dataset (:func:`nbmf_mm_tpu.parallel.grid.
  grid_solve`) instead of 36 sequential fits — one compile, one device
  program, all cells in lockstep on the MXU.
- **Figure 2** (test perplexity at the best hyperparameters, max_iter=1000,
  seed 12345): compared against the original paper author's stored artifacts
  when available (converted from per-entry NLL to exp-perplexity units —
  the two generations of artifacts use different units, BASELINE.md).
- **Figure 3** (rank sweep K in {2,4,8,16}).

Outputs CSVs to ``outputs/`` (one row per configuration) — consumed by
``experiments/display_results.py``.

Usage:
  python experiments/reproduce_magron2022.py [--datasets animals lastfm paleo]
      [--figures 1 2 3] [--outdir outputs] [--dtype float64]
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
from experiments.data import (  # noqa: E402
    DATASETS,
    compute_perplexity,
    load_dataset_and_splits,
    magron_best_val_logpplx,
)
from nbmf_mm_tpu import NBMF  # noqa: E402
from nbmf_mm_tpu.parallel.grid import grid_solve  # noqa: E402

SEED = 12345
ALPHA_GRID = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
BETA_GRID = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
FIG1_K = {"animals": 4, "lastfm": 8, "paleo": 4}
FIG2_PARAMS = {
    "animals": {"alpha": 2.0, "beta": 2.0, "k": 4},
    "lastfm": {"alpha": 1.0, "beta": 1.0, "k": 8},
    "paleo": {"alpha": 2.0, "beta": 2.0, "k": 4},
}
FIG3_KS = [2, 4, 8, 16]
FIG3_PARAMS = {
    "animals": {"alpha": 2.0, "beta": 2.0},
    "lastfm": {"alpha": 1.0, "beta": 1.0},
    "paleo": {"alpha": 2.0, "beta": 2.0},
}


def _write_csv(path: Path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"  wrote {path}")


def run_figure1(datasets, outdir: Path, dtype):
    print("\n=== Figure 1: hyperparameter grid (batched vmap solve) ===")
    for ds in datasets:
        Y, train_mask, val_mask, _ = load_dataset_and_splits(ds)
        k = FIG1_K[ds]
        t0 = time.time()
        res = grid_solve(
            Y,
            k,
            ALPHA_GRID,
            BETA_GRID,
            max_iter=500,
            tol=1e-5,
            mask=train_mask,
            random_state=SEED,
            dtype=dtype,
        )
        grid_time = time.time() - t0
        rows = []
        for g in range(len(res["alpha"])):
            Y_hat = res["W"][g] @ res["H"][g]
            rows.append(
                {
                    "alpha": float(res["alpha"][g]),
                    "beta": float(res["beta"][g]),
                    "train_perplexity": compute_perplexity(Y, Y_hat, train_mask),
                    "val_perplexity": compute_perplexity(Y, Y_hat, val_mask),
                    "n_iter": int(res["n_iter"][g]),
                    "time": grid_time / len(res["alpha"]),
                }
            )
        best = min(rows, key=lambda r: r["val_perplexity"])
        print(
            f"{ds}: {len(rows)} cells in {grid_time:.1f}s (batched) | "
            f"best a={best['alpha']}, b={best['beta']} val_pplx={best['val_perplexity']:.4f}"
        )
        _write_csv(outdir / f"figure1_{ds}_results.csv", rows)


def _baseline_perplexities(Y, train_mask, test_mask, k, dtype):
    """Fit the paper's two comparison baselines from scratch (the reference
    only reads stored artifacts for these)."""
    from nbmf_mm_tpu.models import NBMFEM, LogisticPCA

    out = {}
    em = NBMFEM(n_components=k, max_iter=1000, tol=1e-5, random_state=SEED, dtype=dtype)
    em.fit(Y, mask=train_mask)
    out["nbmf_em_test_perplexity"] = compute_perplexity(Y, em.reconstruction(), test_mask)
    lp = LogisticPCA(n_components=k, max_iter=1000, random_state=SEED, dtype=dtype)
    lp.fit(Y, mask=train_mask)
    out["logpca_test_perplexity"] = compute_perplexity(Y, lp.reconstruction(), test_mask)
    return out


def run_figure2(datasets, outdir: Path, dtype, with_baselines: bool = True):
    print("\n=== Figure 2: test perplexity at best hyperparameters ===")
    rows = []
    for ds in datasets:
        Y, train_mask, _, test_mask = load_dataset_and_splits(ds)
        p = FIG2_PARAMS[ds]
        model = NBMF(
            n_components=p["k"],
            alpha=p["alpha"],
            beta=p["beta"],
            orientation="beta-dir",
            max_iter=1000,
            tol=1e-5,
            random_state=SEED,
            dtype=dtype,
        )
        t0 = time.time()
        model.fit(Y, mask=train_mask)
        fit_time = time.time() - t0
        Y_hat = model.W_ @ model.components_
        test_pplx = compute_perplexity(Y, Y_hat, test_mask)
        magron_nll = magron_best_val_logpplx(ds, p["k"])
        row = {
            "dataset": ds,
            "k": p["k"],
            "alpha": p["alpha"],
            "beta": p["beta"],
            "test_perplexity": test_pplx,
            "magron_best_val_perplexity": (
                float(np.exp(magron_nll)) if magron_nll is not None else float("nan")
            ),
            "n_iter": model.n_iter_,
            "time": fit_time,
        }
        if with_baselines:
            row.update(_baseline_perplexities(Y, train_mask, test_mask, p["k"], dtype))
        rows.append(row)
        print(
            f"{ds}: test_pplx={test_pplx:.4f} "
            f"(magron best-val={row['magron_best_val_perplexity']:.4f}"
            + (
                f", NBMF-EM={row['nbmf_em_test_perplexity']:.4f}"
                f", logPCA={row['logpca_test_perplexity']:.4f}"
                if with_baselines
                else ""
            )
            + f") iters={model.n_iter_} time={fit_time:.2f}s"
        )
        np.savez(
            outdir / f"figure2_{ds}_model.npz",
            W=model.W_,
            H=model.components_,
            loss=np.asarray(model.loss_curve_),
            n_iter=model.n_iter_,
        )
    _write_csv(outdir / "figure2_results.csv", rows)


def run_figure3(datasets, outdir: Path, dtype):
    print("\n=== Figure 3: rank sweep ===")
    for ds in datasets:
        Y, train_mask, _, test_mask = load_dataset_and_splits(ds)
        p = FIG3_PARAMS[ds]
        rows = []
        for k in FIG3_KS:
            model = NBMF(
                n_components=k,
                alpha=p["alpha"],
                beta=p["beta"],
                orientation="beta-dir",
                max_iter=1000,
                tol=1e-5,
                random_state=SEED,
                dtype=dtype,
            )
            t0 = time.time()
            model.fit(Y, mask=train_mask)
            fit_time = time.time() - t0
            Y_hat = model.W_ @ model.components_
            rows.append(
                {
                    "k": k,
                    "alpha": p["alpha"],
                    "beta": p["beta"],
                    "test_perplexity": compute_perplexity(Y, Y_hat, test_mask),
                    "n_iter": model.n_iter_,
                    "time": fit_time,
                }
            )
            print(
                f"{ds} K={k}: test_pplx={rows[-1]['test_perplexity']:.4f} "
                f"iters={rows[-1]['n_iter']} time={fit_time:.2f}s"
            )
        _write_csv(outdir / f"figure3_{ds}_results.csv", rows)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", nargs="+", default=list(DATASETS), choices=DATASETS)
    ap.add_argument("--figures", nargs="+", type=int, default=[1, 2, 3], choices=[1, 2, 3])
    ap.add_argument("--outdir", type=Path, default=Path(__file__).parent.parent / "outputs")
    ap.add_argument("--dtype", default=None, help="compute dtype (default: backend-appropriate)")
    ap.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu", "axon", "default"],
        help="force a JAX platform (default: NBMF_PLATFORM env or cpu+f64)",
    )
    args = ap.parse_args(argv)
    force_platform(args.platform)

    args.outdir.mkdir(parents=True, exist_ok=True)
    if 1 in args.figures:
        run_figure1(args.datasets, args.outdir, args.dtype)
    if 2 in args.figures:
        run_figure2(args.datasets, args.outdir, args.dtype)
    if 3 in args.figures:
        run_figure3(args.datasets, args.outdir, args.dtype)


if __name__ == "__main__":
    main()

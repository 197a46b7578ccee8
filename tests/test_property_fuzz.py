"""Hypothesis property fuzzing of the solver invariants.

Randomized shapes/ranks/hyperparameters/sparsity/masks; every draw must keep
the core guarantees: monotone descent (corrected mode), simplex and box
constraints, finite losses, len(losses) == n_iter.  Deadlines are disabled
(first trace per shape compiles).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nbmf_mm_tpu import solve


@st.composite
def problem(draw):
    m = draw(st.integers(4, 40))
    n = draw(st.integers(4, 40))
    k = draw(st.integers(1, 6))
    alpha = draw(st.floats(0.5, 3.0))
    beta = draw(st.floats(0.5, 3.0))
    p = draw(st.floats(0.05, 0.95))
    seed = draw(st.integers(0, 2**31 - 1))
    masked = draw(st.booleans())
    return m, n, k, alpha, beta, p, seed, masked


@given(problem())
@settings(max_examples=12, deadline=None, derandomize=True)
def test_solver_invariants_fuzz(args):
    m, n, k, alpha, beta, p, seed, masked = args
    rng = np.random.default_rng(seed)
    X = (rng.random((m, n)) < p).astype(float)
    mask = (rng.random((m, n)) < 0.9).astype(float) if masked else None
    r = solve(
        X, k, max_iter=25, tol=0.0, alpha=alpha, beta=beta,
        random_state=seed % 1000, mask=mask, mask_mode="corrected",
    )
    hist = np.asarray(r.losses)
    assert len(hist) == r.n_iter == 25
    assert np.all(np.isfinite(hist))
    assert np.all(np.diff(hist) <= 1e-10), f"ascent {np.diff(hist).max()}"
    np.testing.assert_allclose(r.W.sum(axis=1), 1.0, atol=1e-8)
    assert np.all((r.H > 0) & (r.H < 1))
    assert np.all(r.W >= 0)


@given(st.integers(0, 2**31 - 1), st.integers(1, 5))
@settings(max_examples=8, deadline=None, derandomize=True)
def test_duchi_projection_fuzz(seed, k):
    from nbmf_mm_tpu.ops.projection import project_columns_simplex_duchi

    rng = np.random.default_rng(seed)
    X = rng.normal(scale=rng.uniform(0.1, 10), size=(k, 17))
    P = np.asarray(project_columns_simplex_duchi(X))
    np.testing.assert_allclose(P.sum(axis=0), 1.0, atol=1e-8)
    assert np.all(P >= 0)


@given(problem())
@settings(max_examples=8, deadline=None, derandomize=True)
def test_stripe_kernel_parity_fuzz(args):
    """Randomized shapes through the stripe kernels (interpret) must match
    the tiled kernels on the real region."""
    import jax.numpy as jnp

    from nbmf_mm_tpu.ops import pallas_sweep as ps

    m, n, k, alpha, beta, p, seed, masked = args
    rng = np.random.default_rng(seed)
    Mp, Np = ps.round_up(m, 128), ps.round_up(n, 128)
    Y = jnp.asarray(np.pad((rng.random((m, n)) < p).astype(np.float32),
                           ((0, Mp - m), (0, Np - n))))
    Wr = rng.uniform(0.1, 0.9, (k, m))
    Wr /= Wr.sum(0, keepdims=True)
    W = jnp.asarray(np.pad(Wr.astype(np.float32), ((0, 0), (0, Mp - m))))
    H = jnp.asarray(np.pad(rng.uniform(0.1, 0.9, (k, n)).astype(np.float32),
                           ((0, 0), (0, Np - n))))
    kw = dict(block_m=128, block_n=128, interpret=True)
    Num, Den, ll = ps.hloss_terms(W, H, Y, None, m_real=m, n_real=n, **kw)
    Num2, Den2, ll2 = ps.hloss_terms(W, H, Y, None, m_real=m, n_real=n,
                                     block_m=128, interpret=True, stripe=True)
    np.testing.assert_allclose(np.asarray(Num2)[:, :n], np.asarray(Num)[:, :n],
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Den2)[:, :n], np.asarray(Den)[:, :n],
                               atol=3e-5, rtol=1e-4)
    # ll differs only by the constant sub-1e-8-per-pad-element bias
    pad_elems = Mp * Np - m * n
    assert abs(float(ll2) - float(ll)) <= 2e-8 * pad_elems + 1e-2
    T = ps.w_terms(W, H, Y, None, n_real=n, **kw)
    T2 = ps.w_terms(W, H, Y, None, n_real=n, block_m=128, interpret=True,
                    stripe=True)
    np.testing.assert_allclose(np.asarray(T2)[:, :m], np.asarray(T)[:, :m],
                               atol=3e-5, rtol=1e-4)


@given(problem())
@settings(max_examples=8, deadline=None, derandomize=True)
def test_packed_kernel_bitwise_fuzz(args):
    """Randomized shapes through the bitpacked kernels (interpret) must be
    BIT-IDENTICAL to the dense stripe kernels (select-form on exact 0/1)."""
    import jax.numpy as jnp

    from nbmf_mm_tpu.ops import pallas_sweep as ps

    m, n, k, alpha, beta, p, seed, masked = args
    rng = np.random.default_rng(seed)
    Mp, Np = ps.round_up(m, 128), ps.round_up(n, 128)
    Yr = (rng.random((m, n)) < p).astype(np.float32)
    maskr = (rng.random((m, n)) < 0.8).astype(np.float32) if masked else None
    Ym = Yr * maskr if masked else Yr
    Ym2 = (1.0 - Yr) * maskr if masked else None
    pad = lambda A: None if A is None else jnp.asarray(
        np.pad(A, ((0, Mp - m), (0, Np - n)))
    )
    Ymp, Ym2p = pad(Ym), pad(Ym2)
    Wr = rng.uniform(0.1, 0.9, (k, m))
    Wr /= Wr.sum(0, keepdims=True)
    W = jnp.asarray(np.pad(Wr.astype(np.float32), ((0, 0), (0, Mp - m))))
    H = jnp.asarray(np.pad(rng.uniform(0.1, 0.9, (k, n)).astype(np.float32),
                           ((0, 0), (0, Np - n))))
    Ypk = ps.pack_bits(Ymp, 128)
    Ypk2 = ps.pack_bits(Ym2p, 128) if Ym2p is not None else None

    # parity-mode hloss (complement in-register on both paths)
    Num, Den, ll = ps.hloss_terms(W, H, Ymp, None, m_real=m, n_real=n,
                                  block_m=128, interpret=True, stripe=True)
    Np_, Dp_, llp = ps.hloss_terms_packed(W, H, Ypk, None, block_m=128,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(Num), np.asarray(Np_))
    np.testing.assert_array_equal(np.asarray(Den), np.asarray(Dp_))
    assert float(ll) == float(llp)
    if masked:
        # corrected-mode hloss (explicit complement)
        Nc, Dc, llc = ps.hloss_terms(W, H, Ymp, Ym2p, m_real=m, n_real=n,
                                     block_m=128, interpret=True, stripe=True)
        Ncp, Dcp, llcp = ps.hloss_terms_packed(W, H, Ypk, Ypk2, block_m=128,
                                               interpret=True)
        np.testing.assert_array_equal(np.asarray(Nc), np.asarray(Ncp))
        np.testing.assert_array_equal(np.asarray(Dc), np.asarray(Dcp))
        assert float(llc) == float(llcp)
    T = ps.w_terms(W, H, Ymp, Ym2p, n_real=n, block_m=128, interpret=True,
                   stripe=True)
    Tp = ps.w_terms_packed(W, H, Ypk, Ypk2, n_real=n, block_m=128,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(T), np.asarray(Tp))


@given(st.integers(0, 2**31 - 1), st.integers(2, 4))
@settings(max_examples=6, deadline=None, derandomize=True)
def test_return_all_consistency_fuzz(seed, n_init):
    """all_final_losses, all_W/all_H and the packaged best result must be
    mutually consistent for any seed/restart count."""
    rng = np.random.default_rng(seed)
    X = (rng.random((20, 15)) < 0.4).astype(float)
    r = solve(X, 3, max_iter=20, random_state=seed % 997, n_init=n_init,
              return_all=True)
    ex = r.extras
    assert ex["all_W"].shape == (n_init, 20, 3)
    best = int(np.argmin(r.all_final_losses))
    assert best == r.best_restart
    np.testing.assert_allclose(ex["all_W"][best], r.W, atol=1e-9)
    for i in range(n_init):
        np.testing.assert_allclose(ex["all_W"][i].sum(axis=1), 1.0, atol=1e-8)
        li = ex["all_losses"][i][: ex["all_n_iter"][i]]
        assert np.all(np.isfinite(li)) and np.all(np.diff(li) <= 1e-10)


@given(st.integers(0, 2**31 - 1), st.sampled_from([128, 256]),
       st.integers(1, 4), st.integers(1, 3))
@settings(max_examples=8, deadline=None, derandomize=True)
def test_host_pack_matches_device_pack_fuzz(seed, bm, sm, sn):
    """pack_bits_host must produce bit-identical words to the device packer
    for every stripe geometry, and unpack_bits must invert both."""
    import jax.numpy as jnp

    from nbmf_mm_tpu.ops import pallas_sweep as ps

    rng = np.random.default_rng(seed)
    Mp, Np = bm * sm, 128 * sn
    X = (rng.random((Mp, Np)) < rng.uniform(0.1, 0.9)).astype(np.float32)
    host = ps.pack_bits_host(X, bm)
    dev = np.asarray(ps.pack_bits(jnp.asarray(X), bm))
    np.testing.assert_array_equal(host, dev)
    np.testing.assert_array_equal(np.asarray(ps.unpack_bits(jnp.asarray(host), bm)), X)

"""Pallas fused-kernel parity vs the XLA path (interpret mode on CPU, f32).

The real-TPU execution of the same kernels is exercised by bench.py and the
tpu-marked smoke test; here we pin numerical equivalence including padding
(partial tiles), masking modes, projections, and vmapped restarts.
"""

import numpy as np
import pytest

from nbmf_mm_tpu import solve

F32 = dict(dtype="float32")
PALLAS = dict(backend="pallas", pallas_interpret=True, block_m=64, block_n=64)


def _toy(m=70, n=50, p=0.3, seed=0):
    return (np.random.default_rng(seed).random((m, n)) < p).astype(float)


def _mask(shape, p=0.85, seed=1):
    return (np.random.default_rng(seed).random(shape) < p).astype(float)


def _compare(X, tol=2e-5, **kw):
    a = solve(X, 4, max_iter=15, random_state=0, backend="jnp", **F32, **kw)
    b = solve(X, 4, max_iter=15, random_state=0, **F32, **PALLAS, **kw)
    assert a.n_iter == b.n_iter
    np.testing.assert_allclose(a.W, b.W, atol=tol)
    np.testing.assert_allclose(a.H, b.H, atol=tol)
    np.testing.assert_allclose(a.losses, b.losses, atol=tol)


def test_pallas_parity_unmasked():
    _compare(_toy())


def test_pallas_parity_masked_parity_mode():
    X = _toy()
    _compare(X, mask=_mask(X.shape))


def test_pallas_parity_masked_corrected_mode():
    X = _toy()
    _compare(X, mask=_mask(X.shape), mask_mode="corrected")


def test_pallas_parity_duchi():
    _compare(_toy(), projection="duchi")


def test_pallas_parity_exact_block_multiple():
    # no padding at all: shapes are exact block multiples
    _compare(_toy(m=128, n=64))


def test_pallas_parity_dir_beta():
    _compare(_toy(), orientation="dir-beta")


def test_pallas_restarts_vmap():
    X = _toy(seed=3)
    a = solve(X, 3, max_iter=12, random_state=0, n_init=3, backend="jnp", **F32)
    b = solve(X, 3, max_iter=12, random_state=0, n_init=3, **F32, **PALLAS)
    assert a.best_restart == b.best_restart
    np.testing.assert_allclose(a.W, b.W, atol=2e-5)
    np.testing.assert_allclose(a.all_final_losses, b.all_final_losses, atol=2e-5)


def test_pallas_monotone_f32():
    X = _toy(seed=5)
    res = solve(X, 4, max_iter=40, random_state=0, **F32, **PALLAS)
    # f32 tolerance: the MM guarantee holds to rounding noise
    assert np.all(np.diff(res.losses) <= 1e-5)


def _compare_packed(X, **kw):
    """packed=True vs packed=False on the Pallas path must be bit-identical
    (select-form on exact 0/1 values; see ops/pallas_sweep.py)."""
    a = solve(X, 4, max_iter=15, random_state=0, packed=False, **F32, **PALLAS, **kw)
    b = solve(X, 4, max_iter=15, random_state=0, packed=True, **F32, **PALLAS, **kw)
    assert a.n_iter == b.n_iter
    np.testing.assert_array_equal(a.W, b.W)
    np.testing.assert_array_equal(a.H, b.H)
    np.testing.assert_array_equal(a.losses, b.losses)


def test_packed_bitwise_equal_unmasked():
    _compare_packed(_toy())


def test_packed_bitwise_equal_masked_parity():
    X = _toy()
    _compare_packed(X, mask=_mask(X.shape))


def test_packed_bitwise_equal_masked_corrected():
    X = _toy()
    _compare_packed(X, mask=_mask(X.shape), mask_mode="corrected")


def test_packed_bitwise_equal_duchi():
    _compare_packed(_toy(), projection="duchi")


def test_packed_restarts_vmap():
    X = _toy(seed=3)
    a = solve(X, 3, max_iter=12, random_state=0, n_init=3, packed=False, **F32, **PALLAS)
    b = solve(X, 3, max_iter=12, random_state=0, n_init=3, packed=True, **F32, **PALLAS)
    assert a.best_restart == b.best_restart
    np.testing.assert_array_equal(a.W, b.W)
    np.testing.assert_array_equal(a.all_final_losses, b.all_final_losses)


def test_packed_rejects_continuous_data():
    X = _toy()
    X[0, 0] = 0.5  # in [0,1] (valid input) but not exactly binary
    with pytest.raises(ValueError, match="packed=True requires"):
        solve(X, 4, max_iter=5, random_state=0, packed=True, **F32, **PALLAS)
    # auto mode falls back to the dense kernels and still matches XLA
    _compare(X)


def test_packed_rejects_continuous_mask():
    X = _toy()
    w = _mask(X.shape) * 0.7  # confidence-weighted mask: not binary
    with pytest.raises(ValueError, match="packed=True requires"):
        solve(X, 4, max_iter=5, random_state=0, mask=w, packed=True, **F32, **PALLAS)
    _compare(X, mask=w, mask_mode="corrected", tol=5e-5)


def test_pallas_mesh_n_init_supported():
    # mesh + pallas + restarts: vmapped inside the shard_map (full matrix in
    # tests/test_sharded_pallas.py); smoke-check the 2-device route here.
    import jax

    from nbmf_mm_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(jax.devices()[:2], shape=(2, 1))
    res = solve(
        _toy(), 3, max_iter=10, random_state=0, n_init=2,
        backend="pallas", mesh=mesh, pallas_interpret=True,
        block_m=64, block_n=64, **F32,
    )
    assert res.all_final_losses.shape == (2,)
    assert np.isfinite(res.losses[-1])


def test_packed_true_rejects_non_pallas_backend():
    """packed=True is validated on EVERY routing, not just the Pallas one."""
    with pytest.raises(ValueError, match="packed=True requires the Pallas"):
        solve(_toy(), 4, max_iter=5, random_state=0, packed=True,
              backend="jnp", **F32)


def test_packed_true_rejects_bf16_mode():
    """Packing replaces the data stream, so combining it with an explicit
    bf16 data-storage request is contradictory."""
    with pytest.raises(ValueError, match="incompatible with dtype='bfloat16'"):
        solve(_toy(), 4, max_iter=5, random_state=0, packed=True,
              dtype="bfloat16", **PALLAS)


def test_bf16_mode_disables_auto_packing(monkeypatch):
    """dtype='bfloat16' is an explicit data-storage request; the packed auto
    rule must not silently override it (pack_bits must never run)."""
    from nbmf_mm_tpu.ops import pallas_sweep as ps

    def _boom(*a, **k):
        raise AssertionError("pack_bits must not be called in bf16 mode")

    monkeypatch.setattr(ps, "pack_bits", _boom)
    r = solve(_toy(), 4, max_iter=5, random_state=0, dtype="bfloat16", **PALLAS)
    assert np.all(np.isfinite(r.losses))


def test_f32_auto_packing_engages(monkeypatch):
    """The auto rule (packed=None) does pack eligible binary f32 data —
    host inputs through the host packer, device inputs through the device
    packer."""
    import jax.numpy as jnp

    from nbmf_mm_tpu.ops import pallas_sweep as ps

    calls = []
    for name in ("pack_bits", "pack_bits_host"):
        orig = getattr(ps, name)

        def _spy(A, bm, _orig=orig, _name=name):
            calls.append(_name)
            return _orig(A, bm)

        monkeypatch.setattr(ps, name, _spy)
    solve(_toy(), 4, max_iter=5, random_state=0, **F32, **PALLAS)
    assert "pack_bits_host" in calls, "host input did not host-pack"
    calls.clear()
    solve(jnp.asarray(_toy(), dtype=jnp.float32), 4, max_iter=5,
          random_state=0, **F32, **PALLAS)
    assert "pack_bits" in calls, "device input did not device-pack"


def test_host_and_device_inputs_bitwise_equal():
    """Host inputs are packed on the host and shipped as words; device
    inputs pack on-device — both must produce identical solves."""
    import jax.numpy as jnp

    X = _toy()
    mask = _mask(X.shape)
    for kw in ({}, dict(mask=mask)):
        a = solve(X, 4, max_iter=12, random_state=0, **F32, **PALLAS, **kw)
        dkw = {k: jnp.asarray(np.asarray(v, dtype=np.float32))
               for k, v in kw.items()}
        b = solve(jnp.asarray(np.asarray(X, dtype=np.float32)), 4,
                  max_iter=12, random_state=0, **F32, **PALLAS, **dkw)
        np.testing.assert_array_equal(a.W, b.W)
        np.testing.assert_array_equal(a.H, b.H)
        np.testing.assert_array_equal(a.losses, b.losses)


class TestPackedInput:
    """First-class PackedMatrix input: solve() on pre-packed words is
    bit-identical to solve() on the dense matrix it encodes (same kernels,
    same words), and the chunked packer reproduces the whole-matrix
    packing exactly."""

    def _toy(self, m=300, n=200, seed=11):
        return (np.random.default_rng(seed).random((m, n)) < 0.4).astype(float)

    def test_pack_matrix_roundtrip_and_chunked_equality(self):
        from nbmf_mm_tpu import pack_matrix, pack_matrix_chunked

        Y = self._toy()
        pm = pack_matrix(Y, k=4)
        np.testing.assert_array_equal(np.asarray(pm.unpack()), Y)
        # chunked (host chunks, stripe-misaligned chunk_rows get rounded)
        pm2 = pack_matrix_chunked(
            lambda a, b: Y[a:b], *Y.shape, 4, chunk_rows=100
        )
        np.testing.assert_array_equal(
            np.asarray(pm.words), np.asarray(pm2.words)
        )
        assert pm2.block_m == pm.block_m and pm2.shape == (300, 200)
        # device chunks too
        import jax.numpy as jnp

        Yd = jnp.asarray(Y)
        pm3 = pack_matrix_chunked(
            lambda a, b: Yd[a:b], *Y.shape, 4, chunk_rows=128, validate=False
        )
        np.testing.assert_array_equal(
            np.asarray(pm.words), np.asarray(pm3.words)
        )

    def test_solve_packed_input_bit_identical_to_dense(self):
        from nbmf_mm_tpu import pack_matrix, solve

        Y = self._toy()
        kw = dict(
            max_iter=12, random_state=0, dtype="float32",
            backend="pallas", pallas_interpret=True,
        )
        dense = solve(Y, 4, **kw)  # auto-packs (binary + eligible)
        pm = pack_matrix(Y, k=4)
        packed = solve(pm, 4, **kw)
        np.testing.assert_array_equal(dense.W, packed.W)
        np.testing.assert_array_equal(dense.H, packed.H)
        np.testing.assert_array_equal(
            np.asarray(dense.losses), np.asarray(packed.losses)
        )

    def test_packed_input_contract_errors(self):
        from nbmf_mm_tpu import pack_matrix, solve

        Y = self._toy(m=128, n=128)
        pm = pack_matrix(Y, k=3)
        kw = dict(backend="pallas", pallas_interpret=True)
        with pytest.raises(ValueError, match="beta-dir"):
            solve(pm, 3, orientation="dir-beta", **kw)
        with pytest.raises(ValueError, match="mask"):
            solve(pm, 3, mask=np.ones((128, 128)), **kw)
        with pytest.raises(ValueError, match="packed=False"):
            solve(pm, 3, packed=False, **kw)
        with pytest.raises(ValueError, match="float32"):
            solve(pm, 3, dtype="float64", **kw)
        with pytest.raises(ValueError, match="Pallas backend"):
            solve(pm, 3, backend="jnp")
        # a layout packed for a different stripe height is caught (the
        # stripe-local bit planes only combine with the same block_m)
        from nbmf_mm_tpu import PackedMatrix

        bad = PackedMatrix(words=pm.words, shape=pm.shape, block_m=64)
        with pytest.raises(ValueError, match="PackedMatrix"):
            solve(bad, 3, **kw)
        with pytest.raises(ValueError, match="binary"):
            pack_matrix(Y + 0.5, k=3)

    def test_pack_matrix_sparse_matches_dense(self):
        """Sparse binary input packs bit-identically to the dense packer
        (and no full dense copy of the matrix is ever built — chunked)."""
        import scipy.sparse as sp

        from nbmf_mm_tpu import pack_matrix, pack_matrix_sparse, solve

        Y = (np.random.default_rng(13).random((300, 200)) < 0.05).astype(
            np.float32
        )
        S = sp.csr_matrix(Y)
        pm_s = pack_matrix_sparse(S, 4, chunk_rows=64)
        pm_d = pack_matrix(Y, 4)
        np.testing.assert_array_equal(
            np.asarray(pm_s.words), np.asarray(pm_d.words)
        )
        assert pm_s.block_m == pm_d.block_m and pm_s.shape == (300, 200)
        # solves end-to-end like any PackedMatrix
        r = solve(pm_s, 4, max_iter=8, random_state=0, dtype="float32",
                  backend="pallas", pallas_interpret=True)
        assert np.all(np.isfinite(np.asarray(r.losses)))
        # contract errors
        with pytest.raises(ValueError, match="binary"):
            pack_matrix_sparse(sp.csr_matrix(Y * 3.0), 4)
        with pytest.raises(TypeError, match="scipy.sparse"):
            pack_matrix_sparse(Y, 4)
        # explicit stored zeros are legal (still exactly binary)
        S0 = S.copy().tolil()
        S0[0, 0] = 0.0  # explicit zero entry
        np.testing.assert_array_equal(
            np.asarray(pack_matrix_sparse(S0.tocsr(), 4).words),
            np.asarray(pm_d.words),
        )
        # non-canonical duplicate entries SUM in the dense view (two stored
        # 1.0s at one position are dense 2.0) — must be rejected, not
        # silently packed as bit 1; and the input must not be mutated.
        Sd = sp.csr_matrix(
            (np.ones(2, np.float32), np.zeros(2, np.int32),
             np.array([0, 2] + [2] * 299, np.int32)),
            shape=(300, 200),
        )
        assert not Sd.has_canonical_format
        with pytest.raises(ValueError, match="binary"):
            pack_matrix_sparse(Sd, 4)
        assert Sd.nnz == 2 and not Sd.has_canonical_format  # unmutated

    def test_solve_sparse_autoroutes_to_packed(self):
        """solve(scipy.sparse) on a packed-eligible routing is bit-identical
        to solve(dense) — the sparse matrix goes straight to bit-plane
        words; ineligible routings densify (same results as dense input)."""
        import scipy.sparse as sp

        from nbmf_mm_tpu import solve

        Y = (np.random.default_rng(7).random((300, 200)) < 0.08).astype(
            np.float32
        )
        S = sp.csr_matrix(Y)
        kw = dict(
            max_iter=10, random_state=3, dtype="float32",
            backend="pallas", pallas_interpret=True,
        )
        dense = solve(Y, 4, **kw)
        sparse = solve(S, 4, **kw)
        np.testing.assert_array_equal(dense.W, sparse.W)
        np.testing.assert_array_equal(dense.H, sparse.H)
        # packed=True on the sparse route enforces the binaryness contract
        with pytest.raises(ValueError, match="binary"):
            solve(S * 3.0, 4, packed=True, **kw)
        # ineligible routing (mask) densifies and still matches dense input
        mask = (np.random.default_rng(8).random(Y.shape) < 0.9).astype(
            np.float32
        )
        dm = solve(Y, 4, mask=mask, **kw)
        sm = solve(S, 4, mask=mask, **kw)
        np.testing.assert_allclose(sm.W, dm.W, rtol=0, atol=0)
        # f64 jnp routing (CPU parity regime) densifies too
        d64 = solve(Y.astype(np.float64), 4, max_iter=10, random_state=3)
        s64 = solve(S, 4, max_iter=10, random_state=3)
        np.testing.assert_array_equal(d64.W, s64.W)


class TestWTermsCancellation:
    """Regression for the W-pass cancellation identity (round-3 hardware
    stress find): ``(1-H) @ Q.T`` must NOT be rewritten as
    ``colsum(Q) - H @ Q.T``.  The identity is exact in real arithmetic but
    q reaches ~1/eps ~ 1e8 wherever wh -> 1 on a Y=0 entry, and the two
    separately rounded 1e8-magnitude sums cancel to absolute errors far
    above the true result (negative T -> negative W -> NaN losses on the
    chip).  The two-matmul form keeps every product and partial sum >= 0,
    so T >= 0 holds structurally in ANY floating-point evaluation order.
    """

    K, M, N = 8, 128, 128  # exact block multiples: no padding interplay

    def _case(self):
        # Engineered worst case: H == 1.0 exactly on even columns makes
        # wh == 1 (f32) there, so b == eps and q == 1/eps ~ 1e8 on the
        # Y=0 entries of those columns; odd columns keep moderate values
        # so T also carries ordinary-magnitude structure.
        rng = np.random.default_rng(7)
        W = rng.uniform(0.1, 0.9, (self.K, self.M)).astype(np.float32)
        W /= W.sum(axis=0, keepdims=True)
        H = rng.uniform(0.1, 0.9, (self.K, self.N)).astype(np.float32)
        H[:, ::2] = 1.0
        Y = (rng.random((self.M, self.N)) < 0.3).astype(np.float32)
        Y[:, ::2] = 0.0
        return W, H, Y

    @staticmethod
    def _terms(W, H, Y, eps=1e-8):
        """The per-entry P/Q operands in float64 (kernel's shared-reciprocal
        form; see w_terms in ops/pallas_sweep.py)."""
        wh = W.T.astype(np.float64) @ H.astype(np.float64)
        a = wh + eps
        b = np.maximum(1.0 - wh, 0.0) + eps
        r = 1.0 / (a * b)
        p = Y * (b * r)
        q = (1.0 - Y) * (a * r)
        return p, q

    def test_case_defeats_the_rank1_identity(self):
        # Sanity that the case has teeth: the retired one-matmul form,
        # evaluated in plain f32 (kinder rounding than the MXU's bf16x3),
        # already yields large negative entries where the truth is >= 0.
        W, H, Y = self._case()
        p, q = self._terms(W, H, Y)
        t_old = H.astype(np.float32) @ (p - q).astype(np.float32).T + q.astype(
            np.float32
        ).sum(axis=1)[None, :]
        t_true = H.astype(np.float64) @ p.T + (1.0 - H.astype(np.float64)) @ q.T
        assert t_true.min() >= 0.0
        assert t_old.min() < -1.0  # catastrophic, not last-ulp, cancellation

    @pytest.mark.parametrize("variant", ["tiled", "stripe", "packed"])
    def test_kernels_stay_nonnegative_and_accurate(self, variant):
        from nbmf_mm_tpu.ops.pallas_sweep import pack_bits, w_terms

        W, H, Y = self._case()
        p, q = self._terms(W, H, Y)
        t_true = H.astype(np.float64) @ p.T + (1.0 - H.astype(np.float64)) @ q.T

        if variant == "packed":
            from nbmf_mm_tpu.ops.pallas_sweep import w_terms_packed

            yp = pack_bits(np.asarray(Y), block_m=128)
            t = w_terms_packed(W, H, yp, n_real=self.N, block_m=128, interpret=True)
        else:
            t = w_terms(
                W, H, Y, n_real=self.N, block_m=128, block_n=128,
                interpret=True, stripe=(variant == "stripe"),
            )
        t = np.asarray(t)
        assert t.min() >= 0.0
        # Entries reach ~(1/eps)*N ~ 1e10; f32 agreement is relative.
        np.testing.assert_allclose(t, t_true, rtol=5e-5, atol=1e-4)


def test_precision_plumbing_all_paths():
    """solve/grid/fold-in accept explicit matmul precision on the Pallas
    path (threaded into every kernel dot_general — round-3 'MXU precision
    tiers').  On CPU all tiers compute identical f32 products, so explicit
    precision must reproduce the default bit-for-bit; the real-TPU tier
    behavior is pinned in tests/test_tpu_smoke.py."""
    X = _toy()
    kw = dict(max_iter=10, random_state=0, **F32, **PALLAS)
    a = solve(X, 4, **kw)
    for prec in ("default", "highest"):
        b = solve(X, 4, precision=prec, **kw)
        np.testing.assert_array_equal(a.W, b.W)
        np.testing.assert_array_equal(np.asarray(a.losses), np.asarray(b.losses))

    from nbmf_mm_tpu.models.serving import fold_in_fused
    from nbmf_mm_tpu.parallel.grid import grid_solve

    g = grid_solve(X, 3, [1.5], [2.0], max_iter=5, backend="pallas",
                   pallas_interpret=True, precision="highest")
    assert np.all(np.isfinite(g["final_loss"]))
    W1, _ = fold_in_fused(a.H, X, n_iter=5, interpret=True)
    W2, _ = fold_in_fused(a.H, X, n_iter=5, interpret=True,
                          mxu_precision="highest")
    np.testing.assert_array_equal(W1, W2)


class TestEstimatorPackedAndSparse:
    """NBMF.fit accepts PackedMatrix and scipy.sparse inputs, matching the
    dense fit bit-for-bit on every routing (solver_options forwards the
    interpret/tile knobs to solve)."""

    def test_fit_matches_dense_on_all_input_kinds(self):
        import scipy.sparse as sp

        from nbmf_mm_tpu import NBMF, pack_matrix

        Y = (np.random.default_rng(21).random((300, 200)) < 0.1).astype(
            np.float32
        )
        opts = dict(
            n_components=4, max_iter=10, random_state=5, dtype="float32",
            backend="pallas", solver_options={"pallas_interpret": True},
        )
        md = NBMF(**opts).fit(Y)
        ms = NBMF(**opts).fit(sp.csr_matrix(Y))
        mp = NBMF(**opts).fit(pack_matrix(Y, 4))
        for m in (ms, mp):
            np.testing.assert_array_equal(md.W_, m.W_)
            np.testing.assert_array_equal(md.components_, m.components_)
            np.testing.assert_array_equal(
                np.asarray(md.loss_curve_), np.asarray(m.loss_curve_)
            )
            assert m.n_iter_ == md.n_iter_

    def test_fit_sparse_f64_matches_dense(self):
        """Ineligible routing (f64 CPU default): sparse densifies inside
        solve and the fit is bit-identical to dense input."""
        import scipy.sparse as sp

        from nbmf_mm_tpu import NBMF

        Y = (np.random.default_rng(22).random((60, 40)) < 0.3).astype(float)
        md = NBMF(n_components=3, max_iter=15, random_state=1).fit(Y)
        ms = NBMF(n_components=3, max_iter=15, random_state=1).fit(
            sp.csr_matrix(Y)
        )
        np.testing.assert_array_equal(md.W_, ms.W_)
        np.testing.assert_array_equal(md.components_, ms.components_)

    def test_fit_input_contract_errors(self):
        import scipy.sparse as sp

        from nbmf_mm_tpu import NBMF, pack_matrix

        Y = (np.random.default_rng(23).random((128, 128)) < 0.2).astype(
            np.float32
        )
        with pytest.raises(ValueError, match="binary"):
            NBMF(n_components=3).fit(sp.csr_matrix(Y * 2.0))
        pm = pack_matrix(Y, 3)
        with pytest.raises(ValueError, match="mask"):
            NBMF(
                n_components=3, dtype="float32", backend="pallas",
                solver_options={"pallas_interpret": True},
            ).fit(pm, mask=np.ones_like(Y))


class TestSparseMaskedPacked:
    """Sparse Y + sparse mask pack both operands straight from the sparse
    structures (Ym = Y*mask, Ym2 = mask - Ym) — bit-identical to the dense
    masked solve on the same routing; ineligible cases densify."""

    def _data(self, m=300, n=200, seed=31):
        rng = np.random.default_rng(seed)
        Y = (rng.random((m, n)) < 0.1).astype(np.float32)
        mask = (rng.random((m, n)) < 0.5).astype(np.float32)
        return Y, mask

    @pytest.mark.parametrize("mask_mode", ["parity", "corrected"])
    def test_bit_identical_to_dense(self, mask_mode):
        import scipy.sparse as sp

        from nbmf_mm_tpu import solve

        Y, mask = self._data()
        kw = dict(
            max_iter=10, random_state=2, dtype="float32", mask_mode=mask_mode,
            backend="pallas", pallas_interpret=True,
        )
        dense = solve(Y, 4, mask=mask, **kw)
        sparse = solve(sp.csr_matrix(Y), 4, mask=sp.csr_matrix(mask), **kw)
        np.testing.assert_array_equal(dense.W, sparse.W)
        np.testing.assert_array_equal(dense.H, sparse.H)
        np.testing.assert_array_equal(
            np.asarray(dense.losses), np.asarray(sparse.losses)
        )
        assert dense.n_iter == sparse.n_iter

    def test_restarts_and_estimator(self):
        import scipy.sparse as sp

        from nbmf_mm_tpu import NBMF, solve

        Y, mask = self._data(seed=32)
        kw = dict(
            max_iter=8, random_state=0, dtype="float32",
            backend="pallas", pallas_interpret=True,
        )
        d = solve(Y, 3, mask=mask, n_init=3, **kw)
        s = solve(sp.csr_matrix(Y), 3, mask=sp.csr_matrix(mask), n_init=3, **kw)
        assert d.best_restart == s.best_restart
        np.testing.assert_array_equal(d.W, s.W)
        md = NBMF(n_components=3, max_iter=8, random_state=0, dtype="float32",
                  backend="pallas",
                  solver_options={"pallas_interpret": True})
        ms = NBMF(n_components=3, max_iter=8, random_state=0, dtype="float32",
                  backend="pallas",
                  solver_options={"pallas_interpret": True})
        md.fit(Y, mask=mask)
        ms.fit(sp.csr_matrix(Y), mask=sp.csr_matrix(mask))
        np.testing.assert_array_equal(md.W_, ms.W_)

    def test_ineligible_and_contract(self):
        import scipy.sparse as sp

        from nbmf_mm_tpu import solve

        Y, mask = self._data(seed=33)
        kw = dict(
            max_iter=6, random_state=1, dtype="float32",
            backend="pallas", pallas_interpret=True,
        )
        S, M = sp.csr_matrix(Y), sp.csr_matrix(mask)
        # continuous (non-binary) sparse mask: densify fallback matches dense
        Mw = M * 0.5
        d = solve(Y, 3, mask=mask * 0.5, mask_mode="corrected", **kw)
        s = solve(S, 3, mask=Mw, mask_mode="corrected", **kw)
        np.testing.assert_array_equal(d.W, s.W)
        # packed=True + non-binary sparse mask raises
        with pytest.raises(ValueError, match="binary"):
            solve(S, 3, mask=Mw, packed=True, **kw)
        # all-zero sparse mask is rejected like a dense all-zero mask
        with pytest.raises(ValueError, match="no observed entries"):
            solve(S, 3, mask=sp.csr_matrix(Y.shape, dtype=np.float32), **kw)
        # sparse Y + DENSE mask keeps the existing dense-staging path
        d2 = solve(Y, 3, mask=mask, **kw)
        s2 = solve(S, 3, mask=mask, **kw)
        np.testing.assert_array_equal(d2.W, s2.W)

    def test_packed_true_stripe_ineligible_masked_sparse(self):
        """packed=True must raise (not silently densify) when the masked
        sparse geometry cannot run the packed stripe kernels."""
        import scipy.sparse as sp

        from nbmf_mm_tpu import solve

        Y = sp.random(128, 30000, density=0.001, format="csr", random_state=1)
        Y.data[:] = 1.0
        M = sp.random(128, 30000, density=0.01, format="csr", random_state=2)
        M.data[:] = 1.0
        with pytest.raises(ValueError, match="stripe-eligible"):
            solve(Y, 256, mask=M, packed=True, max_iter=2, dtype="float32",
                  backend="pallas", pallas_interpret=True)

    def test_warm_start_and_checkpoint_compose_with_packed_input(self):
        """W_init/H_init warm starts and segmented checkpointed fits work on
        PackedMatrix and sparse inputs just like dense (same routing)."""
        import scipy.sparse as sp

        from nbmf_mm_tpu import NBMF, pack_matrix, solve
        from nbmf_mm_tpu.utils.checkpoint import fit_checkpointed

        Y = (np.random.default_rng(41).random((300, 200)) < 0.1).astype(
            np.float32
        )
        pm = pack_matrix(Y, 4)
        kw = dict(max_iter=6, random_state=0, dtype="float32",
                  backend="pallas", pallas_interpret=True)
        first = solve(pm, 4, **kw)
        dense_first = solve(Y, 4, **kw)
        # warm-start continuation on the packed input == dense continuation
        cont_p = solve(pm, 4, W_init=first.W, H_init=first.H, **kw)
        cont_d = solve(Y, 4, W_init=dense_first.W, H_init=dense_first.H, **kw)
        np.testing.assert_array_equal(cont_p.W, cont_d.W)
        np.testing.assert_array_equal(cont_p.H, cont_d.H)
        # segmented checkpointed fit accepts sparse input end-to-end
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            m1 = NBMF(n_components=4, max_iter=9, random_state=0,
                      dtype="float32", backend="pallas",
                      solver_options={"pallas_interpret": True})
            fitted = fit_checkpointed(
                m1, sp.csr_matrix(Y), td + "/ck.npz", every=4
            )
            assert fitted.n_iter_ <= 9
            assert np.all(np.isfinite(fitted.loss_curve_))
            assert np.all(np.diff(np.asarray(fitted.loss_curve_)) <= 1e-5)

    def test_pack_sparse_words_chunk_boundaries_bit_equal(self):
        """pack_sparse_words must be bit-identical to pack_bits_host on the
        padded dense equivalent for ANY chunking — including chunk sizes
        that split the matrix mid-way and stripes shrunk by _pick_block —
        for both the plain and complement forms."""
        import scipy.sparse as sp

        from nbmf_mm_tpu.ops import pallas_sweep as ps
        from nbmf_mm_tpu.ops.packed import pack_sparse_words

        rng = np.random.default_rng(61)
        for m, n, Mp, Np, bm in [
            (300, 200, 384, 256, 128),
            (400, 130, 512, 256, 256),   # _pick_block shrink (Mp%256==0)
            (100, 50, 128, 128, 128),    # single chunk, heavy padding
        ]:
            Y = (rng.random((m, n)) < 0.1).astype(np.float32)
            S = sp.csr_matrix(Y)
            dense = np.zeros((Mp, Np), dtype=np.uint8)
            dense[:m, :n] = Y
            comp = np.zeros((Mp, Np), dtype=np.uint8)
            comp[:m, :n] = 1 - Y[:m, :n]
            for chunk_rows in (None, 128, 256):
                w = pack_sparse_words(S, Mp, Np, bm, chunk_rows=chunk_rows)
                np.testing.assert_array_equal(
                    w, ps.pack_bits_host(dense, bm),
                    err_msg=f"{(m, n, Mp, Np, bm, chunk_rows)}",
                )
                wc = pack_sparse_words(
                    S, Mp, Np, bm, complement=True, chunk_rows=chunk_rows
                )
                np.testing.assert_array_equal(
                    wc, ps.pack_bits_host(comp, bm),
                    err_msg=f"complement {(m, n, Mp, Np, bm, chunk_rows)}",
                )

    def test_sparse_device_results_stays_on_device(self):
        """solve(sparse, device_results=True) composes: factors come back
        as device arrays (ready for FoldInServer handoff), bit-identical
        to the dense solve's."""
        import jax
        import scipy.sparse as sp

        from nbmf_mm_tpu import solve

        Y = (np.random.default_rng(71).random((300, 200)) < 0.08).astype(
            np.float32
        )
        kw = dict(max_iter=8, random_state=1, dtype="float32",
                  backend="pallas", pallas_interpret=True)
        d = solve(Y, 4, **kw)
        s = solve(sp.csr_matrix(Y), 4, device_results=True, **kw)
        assert isinstance(s.W, jax.Array) and isinstance(s.H, jax.Array)
        np.testing.assert_array_equal(d.W, np.asarray(s.W))
        np.testing.assert_array_equal(d.H, np.asarray(s.H))


def test_artifact_configs_stay_pack_eligible():
    """The committed artifact harnesses (flagship_scale.py, bench.py,
    bench_shapes.py) assert pack-eligibility at runtime on hardware; pin it
    here on CPU so a select_stripe heuristic change can't silently demote a
    flagship config to the dense path between hardware runs."""
    from nbmf_mm_tpu.ops import pallas_sweep as ps

    # (M, N, K) of: bench headline, flagship headline_1e9, ceiling_4e9,
    # ceiling_1e10, sparse_3pct_1e9, and bench_shapes' K/aspect sweep points
    # that are expected to pack.
    packable = [
        (10_000, 10_000, 128),
        (100_000, 10_000, 128),
        (400_000, 10_000, 64),
        (1_000_000, 10_000, 32),
        (10_000, 10_000, 16),
        (10_000, 10_000, 64),
        (100_000, 1_000, 128),
    ]
    for M, N, K in packable:
        Mp, Np = ps.round_up(M, 512), ps.round_up(N, 512)
        ok, bm = ps.select_stripe(K, Mp, Np, 1, packed=True)
        assert ok, (M, N, K)
        assert Mp % bm == 0 and bm % 32 == 0, (M, N, K, bm)
        # Mosaic legality of the words stripe block (bm/32, Np): its
        # second-minor dim must be divisible by 8 or equal the full
        # words-array rows.  bm=128 (4 word rows) crashed on hardware —
        # found by the K=256 row of the round-5 shape sweep.
        assert (bm // 32) % 8 == 0 or bm == Mp, (M, N, K, bm)
    # The wide aspect point intentionally exceeds the stripe VMEM budget and
    # must route dense-tiled (bench_shapes records the routing per row).
    ok, _ = ps.select_stripe(
        128, ps.round_up(1_000, 512), ps.round_up(100_000, 512), 1, packed=True
    )
    assert not ok
    # K=256 at 10240x10240: bm=256 exceeds the stripe VMEM budget and
    # bm=128's words block is Mosaic-illegal, so packing must be DECLINED
    # (it previously returned bm=128 and crashed the hardware shape sweep).
    ok, _ = ps.select_stripe(256, 10_240, 10_240, 1, packed=True)
    assert not ok

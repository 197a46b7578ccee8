"""Fused Pallas TPU kernels for the NBMF-MM sweep.

The XLA path (:mod:`nbmf_mm_tpu.ops.updates`) materializes several (m, n)
temporaries per sweep in HBM (``WH``, the two Bernoulli ratio matrices, the
log-likelihood matrix, ...), so at large M, N the sweep is HBM-bound on ~10
full passes over m*n data.  These kernels fuse each of the three structural
contractions of a sweep into a single pass that reads the data matrix ONCE
and keeps every (tile_m, tile_n) temporary in VMEM:

- :func:`hloss_terms` — ``Num = W @ (Ym / (W.T@H + eps))``, ``Den = W @
                      (Yc / (1 - W.T@H + eps))`` (both (k, n)) AND the
                      Bernoulli log-likelihood of the current (W, H), all
                      from one ``W.T@H`` (reference formulas
                      ``_solver.py:39-43,148-155``; the loss fuses in via
                      the solver's shifted-loss schedule);
- :func:`w_terms`   — ``T = H @ (Ym / (W.T@H + eps)).T
                           + (1-H) @ (Ym2 / (1 - W.T@H + eps)).T`` ((k, m)),
                      the W-update contraction (``_solver.py:50-53``);
- :func:`h_terms` / :func:`loglik_sum` — the unfused variants (used by the
                      post-loop final-loss fill and available standalone).

Per full sweep this is 2 reads of the (m, n) data and zero (m, n) writes,
versus ~10 reads + ~7 writes for the XLA path — the kernels exist purely to
buy that bandwidth back; the math is numerically equivalent to the jnp path
to within 1 ulp (same epsilon placement and operation order inside each
tile, but ratios are formed through a shared reciprocal — one VPU divide
instead of two — so ``p = ym * (b * r)`` with ``r = 1/(a*b)`` is not
bit-identical to ``ym / a``; observed cross-backend trajectory deltas are
~1e-16, i.e. last-ulp).  Do not rely on bit-exact cross-backend
reproducibility; same-backend runs remain bit-deterministic.

Every kernel takes ``precision=`` (threaded into each ``dot_general``):
``None`` leaves the MXU at DEFAULT — on TPU that is full-rate f32 with
bf16-grade product rounding (~3.5e-3 relative, measured) — while
``"highest"``/``lax.Precision.HIGHEST`` buys true-f32 products at ~3.4x
slower matmuls (docs/performance.md "MXU precision tiers").

Layout / padding contract (established by :func:`pad_operands`):

- internal factor layout ``W (k, Mp)``, ``H (k, Np)`` with k on the sublane
  axis (Mosaic pads k to the 8-sublane tile internally; lanes are the long
  m/n axes, always padded to the 128-lane grid by block choice);
- ``Mp``/``Np`` are multiples of the block sizes; data matrices are
  zero-padded, W's pad *columns* are zero (their contributions then vanish
  identically in every contraction), and the caller zeroes H's pad columns
  after each elementwise update (:func:`apply_col_validity`);
- partial tiles are exactified in-kernel with iota validity masks where a
  "1 - Ym" complement would otherwise leak pad contributions (W pass and
  loss pass); real-region results are bit-identical to the unpadded math.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too; guard only exotic cases.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = pl.ANY
    _SMEM = pl.ANY

__all__ = [
    "h_terms",
    "w_terms",
    "loglik_sum",
    "pack_bits",
    "hloss_terms_packed",
    "w_terms_packed",
    "pad_operands",
    "apply_col_validity",
    "round_up",
]

DEFAULT_BLOCK = 512


def _acc_dtype(dtype):
    """MXU accumulation dtype: f32 for half types, else the input dtype
    (f64 only occurs in interpret-mode tests on CPU)."""
    d = jnp.dtype(dtype)
    return jnp.float32 if d in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)) else d


def _mxu_dtype(data_dtype, factor_dtype):
    """MXU operand dtype.  When the data matrices are stored bf16 (lossless
    for binary data, halves the dominant HBM traffic) the matmul operands
    are cast to bf16 in-register so the MXU runs at full bf16 rate, with f32
    accumulation; ratios are still formed in f32 on the VPU."""
    if jnp.dtype(data_dtype) == jnp.dtype(jnp.bfloat16):
        return jnp.bfloat16
    return jnp.dtype(factor_dtype)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(dim: int, block: int) -> int:
    """Lane-legal block for ``dim``: the requested ``block`` shrunk for
    short axes, then rounded UP to a multiple of 128.

    The Mosaic TPU lowering requires the last two block dims to be
    divisible by (8, 128) or equal the full array dims; every block size
    here appears as a LANE dim in some spec (m in the W/T specs, n in the
    H/Num specs), so sub-128 user blocks (legal in interpret mode, used by
    CPU tests) would fail to lower on hardware — found by running the
    randomized stress sweep on a real chip.
    """
    return round_up(min(block, round_up(dim, 128)), 128)


# ----------------------------------------------------------------- H pass
def h_terms(
    W: jnp.ndarray,
    H: jnp.ndarray,
    Ym: jnp.ndarray,
    Yc: Optional[jnp.ndarray] = None,
    *,
    eps: float = 1e-8,
    block_m: int = DEFAULT_BLOCK,
    block_n: int = DEFAULT_BLOCK,
    interpret: bool = False,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused H-update contractions on padded operands.

    ``Yc=None`` selects the parity/unmasked complement ``1 - Ym`` computed
    in-register (the common case); a explicit ``Yc`` array serves the
    ``mask_mode="corrected"`` semantics.
    """
    k, Mp = W.shape
    _, Np = H.shape
    bm, bn = _pick_block(Mp, block_m), _pick_block(Np, block_n)
    grid = (Np // bn, Mp // bm)  # m innermost: accumulate (k, bn) across m
    acc = _acc_dtype(W.dtype)
    mxu = _mxu_dtype(Ym.dtype, W.dtype)

    explicit_yc = Yc is not None

    def kernel(*refs):
        if explicit_yc:
            w_ref, h_ref, ym_ref, yc_ref, num_ref, den_ref = refs
        else:
            w_ref, h_ref, ym_ref, num_ref, den_ref = refs
            yc_ref = None

        @pl.when(pl.program_id(1) == 0)
        def _init():
            num_ref[...] = jnp.zeros(num_ref.shape, num_ref.dtype)
            den_ref[...] = jnp.zeros(den_ref.shape, den_ref.dtype)

        w = w_ref[...].astype(mxu)
        ym = ym_ref[...].astype(acc)
        wh = jax.lax.dot_general(
            w, h_ref[...].astype(mxu), (((0,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )  # (bm, bn)
        # Shared-reciprocal ratios: one VPU divide instead of two.
        # p = ym/(wh+eps), q = yc/(1-wh+eps) via r = 1/((wh+eps)(1-wh+eps)).
        a = wh + eps
        b = jnp.maximum(1.0 - wh, 0.0) + eps  # exact when wh <= 1; guards f32 wh>1 rounding
        r = 1.0 / (a * b)
        p = ym * (b * r)
        yc = yc_ref[...].astype(acc) if explicit_yc else (1.0 - ym)
        q = yc * (a * r)
        num_ref[...] += jax.lax.dot_general(
            w, p.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        den_ref[...] += jax.lax.dot_general(
            w, q.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )

    in_specs = [
        pl.BlockSpec((k, bm), lambda i, j: (0, j), memory_space=_VMEM),  # W
        pl.BlockSpec((k, bn), lambda i, j: (0, i), memory_space=_VMEM),  # H
        pl.BlockSpec((bm, bn), lambda i, j: (j, i), memory_space=_VMEM),  # Ym
    ]
    if explicit_yc:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (j, i), memory_space=_VMEM))
    out_specs = (
        pl.BlockSpec((k, bn), lambda i, j: (0, i), memory_space=_VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, i), memory_space=_VMEM),
    )
    flops = 6 * Mp * Np * k
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((k, Np), W.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=Mp * Np * 4 * (2 if explicit_yc else 1), transcendentals=0
        ),
        interpret=interpret,
    )
    args = (W, H, Ym) + ((Yc,) if explicit_yc else ())
    return call(*args)


# ------------------------------------------------------- fused H+loss pass
def hloss_terms(
    W: jnp.ndarray,
    H: jnp.ndarray,
    Ym: jnp.ndarray,
    Yc: Optional[jnp.ndarray] = None,
    *,
    eps: float = 1e-8,
    m_real: int,
    n_real: int,
    block_m: int = DEFAULT_BLOCK,
    block_n: int = DEFAULT_BLOCK,
    interpret: bool = False,
    precision=None,
    stripe: bool = False,
):
    """One fused pass computing BOTH the H-update contractions and the
    Bernoulli log-likelihood of the *current* ``(W, H)``.

    ``stripe=True`` delegates to :func:`hloss_terms_stripe` (full-width
    data stripes with VMEM-resident factors/outputs — the HBM-stream-floor
    layout; ``block_n`` is ignored there).

    The loss the reference reports for sweep ``t`` is evaluated on the
    factors that the next sweep's H pass reads again — the same ``W.T @ H``
    product.  Fusing the two (shifted-loss loop in the solver driver) turns
    the 3-pass sweep into 2 single-read passes with bit-identical results.

    Returns ``(Num, Den, ll_sum)`` with ``ll_sum`` a (1, 1) scalar over the
    real (m, n) region only.
    """
    if stripe:
        return hloss_terms_stripe(
            W, H, Ym, Yc, eps=eps, m_real=m_real, n_real=n_real,
            block_m=block_m, interpret=interpret, precision=precision,
        )
    k, Mp = W.shape
    _, Np = H.shape
    bm, bn = _pick_block(Mp, block_m), _pick_block(Np, block_n)
    grid = (Np // bn, Mp // bm)  # m innermost: accumulate (k, bn) across m
    acc = _acc_dtype(W.dtype)
    mxu = _mxu_dtype(Ym.dtype, W.dtype)

    explicit_yc = Yc is not None

    def kernel(*refs):
        if explicit_yc:
            w_ref, h_ref, ym_ref, yc_ref, num_ref, den_ref, ll_ref = refs
        else:
            w_ref, h_ref, ym_ref, num_ref, den_ref, ll_ref = refs
            yc_ref = None

        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            num_ref[...] = jnp.zeros(num_ref.shape, num_ref.dtype)
            den_ref[...] = jnp.zeros(den_ref.shape, den_ref.dtype)

        @pl.when(jnp.logical_and(i == 0, j == 0))
        def _init_ll():
            ll_ref[0, 0] = jnp.zeros((), acc)

        w = w_ref[...].astype(mxu)
        ym = ym_ref[...].astype(acc)
        wh = jax.lax.dot_general(
            w, h_ref[...].astype(mxu), (((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        )  # (bm, bn)
        yc = yc_ref[...].astype(acc) if explicit_yc else (1.0 - ym)
        a = wh + eps
        b = jnp.maximum(1.0 - wh, 0.0) + eps  # exact when wh <= 1; guards f32 wh>1 rounding
        r = 1.0 / (a * b)
        p = ym * (b * r)
        q = yc * (a * r)
        num_ref[...] += jax.lax.dot_general(
            w, p.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        den_ref[...] += jax.lax.dot_general(
            w, q.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        # Log-likelihood of the current (W, H) over the real region.
        ll = ym * jnp.log(a) + yc * jnp.log(b)
        row = j * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        col = i * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        valid = jnp.logical_and(row < m_real, col < n_real)
        ll_ref[0, 0] += jnp.sum(jnp.where(valid, ll, 0.0))

    in_specs = [
        pl.BlockSpec((k, bm), lambda i, j: (0, j), memory_space=_VMEM),  # W
        pl.BlockSpec((k, bn), lambda i, j: (0, i), memory_space=_VMEM),  # H
        pl.BlockSpec((bm, bn), lambda i, j: (j, i), memory_space=_VMEM),  # Ym
    ]
    if explicit_yc:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (j, i), memory_space=_VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((k, bn), lambda i, j: (0, i), memory_space=_VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, i), memory_space=_VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=_SMEM if pltpu else pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((1, 1), acc),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * Np * k,
            bytes_accessed=Mp * Np * 4 * (2 if explicit_yc else 1),
            transcendentals=2 * Mp * Np,
        ),
        interpret=interpret,
    )
    args = (W, H, Ym) + ((Yc,) if explicit_yc else ())
    Num, Den, ll = call(*args)
    return Num, Den, ll[0, 0]


# ----------------------------------------------------------------- W pass
def w_terms(
    W: jnp.ndarray,
    H_new: jnp.ndarray,
    Ym: jnp.ndarray,
    Ym2: Optional[jnp.ndarray] = None,
    *,
    n_real: int,
    eps: float = 1e-8,
    block_m: int = DEFAULT_BLOCK,
    block_n: int = DEFAULT_BLOCK,
    interpret: bool = False,
    precision=None,
    stripe: bool = False,
) -> jnp.ndarray:
    """Fused W-update contraction ``T (k, Mp)`` on padded operands.

    ``Ym2=None`` means unmasked data: the complement ``1 - Ym`` is formed
    in-register with an iota validity mask so zero-padded columns beyond
    ``n_real`` contribute exactly nothing.  ``stripe=True`` delegates to
    :func:`w_terms_stripe` (``block_n`` ignored).
    """
    if stripe:
        return w_terms_stripe(
            W, H_new, Ym, Ym2, n_real=n_real, eps=eps,
            block_m=block_m, interpret=interpret, precision=precision,
        )
    k, Mp = W.shape
    _, Np = H_new.shape
    bm, bn = _pick_block(Mp, block_m), _pick_block(Np, block_n)
    grid = (Mp // bm, Np // bn)  # n innermost: accumulate (k, bm) across n
    acc = _acc_dtype(W.dtype)
    mxu = _mxu_dtype(Ym.dtype, W.dtype)

    explicit_ym2 = Ym2 is not None

    def kernel(*refs):
        if explicit_ym2:
            w_ref, h_ref, ym_ref, ym2_ref, t_ref = refs
        else:
            w_ref, h_ref, ym_ref, t_ref = refs
            ym2_ref = None

        @pl.when(pl.program_id(1) == 0)
        def _init():
            t_ref[...] = jnp.zeros(t_ref.shape, t_ref.dtype)

        h = h_ref[...].astype(mxu)
        ym = ym_ref[...].astype(acc)
        wh = jax.lax.dot_general(
            w_ref[...].astype(mxu), h, (((0,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )  # (bm, bn)
        a = wh + eps
        b = jnp.maximum(1.0 - wh, 0.0) + eps  # exact when wh <= 1; guards f32 wh>1 rounding
        r = 1.0 / (a * b)
        p = ym * (b * r)
        if explicit_ym2:
            ym2 = ym2_ref[...].astype(acc)
        else:
            j = pl.program_id(1)
            col = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
            ym2 = jnp.where(col < n_real, 1.0 - ym, 0.0)
        q = ym2 * (a * r)
        # T += H @ P.T + (1-H) @ Q.T, contracting the n axis of both
        # operands.  This MUST stay in the two-matmul all-nonnegative form:
        # the "one matmul + rank-1 reduction" identity
        #   H @ (P - Q).T + broadcast(sum_n Q)
        # is exact in real arithmetic but catastrophically cancels on the
        # MXU — q reaches ~1/b ~ 1e7-1e8 wherever wh -> 1 on a Y=0 entry
        # (routine near convergence, and immediately under beta < 1 priors),
        # and at DEFAULT precision the MXU's f32 products carry bf16-grade
        # rounding (3.5e-3 relative, measured — docs/performance.md "MXU
        # precision tiers"), leaving absolute errors ~q*3.5e-3 ~ 1e5 that
        # the cancellation exposes, driving T < 0 -> negative W ->
        # log(WH<0) = NaN losses.  Found by the randomized stress sweep on
        # a real chip (seed 1, draw 9: (32, 4) k=6 dir-beta beta=0.51 gave
        # minT = -2.78e5 vs +15.8 true); the nonneg form keeps every
        # product and partial sum >= 0, so T >= 0 structurally in floating
        # point at ANY product precision.
        t_ref[...] += jax.lax.dot_general(
            h, p.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        ) + jax.lax.dot_general(
            1.0 - h, q.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        )

    in_specs = [
        pl.BlockSpec((k, bm), lambda i, j: (0, i), memory_space=_VMEM),  # W
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=_VMEM),  # H_new
        pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=_VMEM),  # Ym
    ]
    if explicit_ym2:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=_VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, bm), lambda i, j: (0, i), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((k, Mp), W.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * Mp * Np * k,
            bytes_accessed=Mp * Np * 4 * (2 if explicit_ym2 else 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    args = (W, H_new, Ym) + ((Ym2,) if explicit_ym2 else ())
    return call(*args)


# --------------------------------------------------------------- loss pass
def loglik_sum(
    W: jnp.ndarray,
    H: jnp.ndarray,
    Ym: jnp.ndarray,
    Yc: Optional[jnp.ndarray] = None,
    *,
    m_real: int,
    n_real: int,
    eps: float = 1e-8,
    block_m: int = DEFAULT_BLOCK,
    block_n: int = DEFAULT_BLOCK,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Fused masked Bernoulli log-likelihood sum over the real (m, n) region."""
    k, Mp = W.shape
    _, Np = H.shape
    bm, bn = _pick_block(Mp, block_m), _pick_block(Np, block_n)
    grid = (Mp // bm, Np // bn)
    acc = _acc_dtype(W.dtype)
    mxu = _mxu_dtype(Ym.dtype, W.dtype)

    explicit_yc = Yc is not None

    def kernel(*refs):
        if explicit_yc:
            w_ref, h_ref, ym_ref, yc_ref, out_ref = refs
        else:
            w_ref, h_ref, ym_ref, out_ref = refs
            yc_ref = None

        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(jnp.logical_and(i == 0, j == 0))
        def _init():
            out_ref[0, 0] = jnp.zeros((), acc)

        ym = ym_ref[...].astype(acc)
        wh = jax.lax.dot_general(
            w_ref[...].astype(mxu), h_ref[...].astype(mxu), (((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        )
        yc = yc_ref[...].astype(acc) if explicit_yc else (1.0 - ym)
        ll = ym * jnp.log(wh + eps) + yc * jnp.log(jnp.maximum(1.0 - wh, 0.0) + eps)
        row = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        col = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        valid = jnp.logical_and(row < m_real, col < n_real)
        out_ref[0, 0] += jnp.sum(jnp.where(valid, ll, 0.0))

    in_specs = [
        pl.BlockSpec((k, bm), lambda i, j: (0, i), memory_space=_VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=_VMEM),
        pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=_VMEM),
    ]
    if explicit_yc:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=_VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=_SMEM if pltpu else pl.ANY
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), acc),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * k,
            bytes_accessed=Mp * Np * 4 * (2 if explicit_yc else 1),
            transcendentals=2 * Mp * Np,
        ),
        interpret=interpret,
    )
    args = (W, H, Ym) + ((Yc,) if explicit_yc else ())
    return call(*args)[0, 0]




def _resident_params(dimension_semantics=None):
    """Raise the scoped-VMEM cap for kernels with VMEM-resident factors
    (the stripe/packed variants): four full-width (k, 10^4)-class f32
    operands (~21 MB at k=128) exceed the default ~16 MB scoped limit; v5e
    VMEM is 128 MB."""
    if pltpu is None:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=dimension_semantics,
    )


# ------------------------------------------------------- stripe variants
#
# Full-width (bm, Np) data stripes; the grid runs over m only, and W/H and
# the (k, ·) outputs are VMEM-resident for the whole pass, so each grid
# step is one data-stripe fetch + compute with no W/H tile re-fetch and no
# revisited accumulators.  The W stripe pass needs NO accumulation at all:
# each m-stripe computes its T columns completely in one step.  Measured
# through real solver loops (slope-timed, see docs/performance.md): 1.52
# ms/sweep dense vs ~2.0 for the (512, 512)-tiled grid at 10^4 x 10^4
# K=128 f32 — the passes run at the 5-matmul MXU floor.


def hloss_terms_stripe(
    W: jnp.ndarray,
    H: jnp.ndarray,
    Ym: jnp.ndarray,
    Yc: Optional[jnp.ndarray] = None,
    *,
    eps: float = 1e-8,
    m_real: int,
    n_real: int,
    block_m: int = 256,
    interpret: bool = False,
    precision=None,
):
    """Fused H-update + loss pass on full-width (block_m, Np) data stripes.

    Semantics identical to :func:`hloss_terms`.
    """
    k, Mp = W.shape
    _, Np = H.shape
    bm = _pick_block(Mp, block_m)
    grid = (Mp // bm,)
    acc = _acc_dtype(W.dtype)
    mxu = _mxu_dtype(Ym.dtype, W.dtype)
    explicit_yc = Yc is not None

    def kernel(*refs):
        if explicit_yc:
            w_ref, h_ref, ym_ref, yc_ref, num_ref, den_ref, ll_ref = refs
        else:
            w_ref, h_ref, ym_ref, num_ref, den_ref, ll_ref = refs
            yc_ref = None

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            num_ref[...] = jnp.zeros(num_ref.shape, num_ref.dtype)
            den_ref[...] = jnp.zeros(den_ref.shape, den_ref.dtype)
            ll_ref[0, 0] = jnp.zeros((), acc)

        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        ym = ym_ref[...].astype(acc)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )  # (bm, Np)
        yc = yc_ref[...].astype(acc) if explicit_yc else (1.0 - ym)
        a = wh + eps
        b = jnp.maximum(1.0 - wh, 0.0) + eps  # exact when wh <= 1; guards f32 wh>1 rounding
        r = 1.0 / (a * b)
        p = ym * (b * r)
        q = yc * (a * r)
        num_ref[...] += jax.lax.dot_general(
            w, p.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        den_ref[...] += jax.lax.dot_general(
            w, q.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        # Pad contribution analysis (why no iota validity mask here): pad
        # rows/cols carry ym = 0 and wh = 0 exactly (zero-padded data, W pad
        # columns and H pad columns are kept zero by the solver), so each
        # pad element adds the CONSTANT yc * log(1 + eps) <= 1e-8 to the
        # sum.  The bias is identical every sweep (pads never change), so
        # loss *differences* — the stopping rule — are unaffected, and the
        # absolute loss shifts by < 1e-8 * pad_fraction, orders below f32
        # resolution of the sum.  Masked modes pass explicit zero-padded
        # Yc, where the pad terms are exactly zero.
        ll = ym * jnp.log(a) + yc * jnp.log(b)
        ll_ref[0, 0] += jnp.sum(ll)

    in_specs = [
        pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),  # W tile
        pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),  # H resident
        pl.BlockSpec((bm, Np), lambda j: (j, 0), memory_space=_VMEM),  # Ym stripe
    ]
    if explicit_yc:
        in_specs.append(pl.BlockSpec((bm, Np), lambda j: (j, 0), memory_space=_VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=_SMEM if pltpu else pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((1, 1), acc),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * Np * k,
            bytes_accessed=Mp * Np * 4 * (2 if explicit_yc else 1),
            transcendentals=2 * Mp * Np,
        ),
        compiler_params=_resident_params(),
        interpret=interpret,
    )
    args = (W, H, Ym) + ((Yc,) if explicit_yc else ())
    Num, Den, ll = call(*args)
    return Num, Den, ll[0, 0]


def w_terms_stripe(
    W: jnp.ndarray,
    H_new: jnp.ndarray,
    Ym: jnp.ndarray,
    Ym2: Optional[jnp.ndarray] = None,
    *,
    n_real: int,
    eps: float = 1e-8,
    block_m: int = 256,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """W-update contraction on full-width (block_m, Np) data stripes.

    Each grid step computes its T output columns completely (full-n
    contraction in one step) — no accumulator revisits at all.  Semantics
    identical to :func:`w_terms`.
    """
    k, Mp = W.shape
    _, Np = H_new.shape
    bm = _pick_block(Mp, block_m)
    grid = (Mp // bm,)
    acc = _acc_dtype(W.dtype)
    mxu = _mxu_dtype(Ym.dtype, W.dtype)
    explicit_ym2 = Ym2 is not None

    def kernel(*refs):
        if explicit_ym2:
            w_ref, h_ref, ym_ref, ym2_ref, t_ref = refs
        else:
            w_ref, h_ref, ym_ref, t_ref = refs
            ym2_ref = None

        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        ym = ym_ref[...].astype(acc)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )  # (bm, Np)
        a = wh + eps
        b = jnp.maximum(1.0 - wh, 0.0) + eps  # exact when wh <= 1; guards f32 wh>1 rounding
        r = 1.0 / (a * b)
        p = ym * (b * r)
        if explicit_ym2:
            ym2 = ym2_ref[...].astype(acc)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (bm, Np), 1)
            ym2 = jnp.where(col < n_real, 1.0 - ym, 0.0)
        q = ym2 * (a * r)
        # Two-matmul all-nonnegative form — see w_terms for why the
        # one-matmul cancellation identity is forbidden on the MXU.
        t_ref[...] = jax.lax.dot_general(
            h, p.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        ) + jax.lax.dot_general(
            1.0 - h, q.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        )

    in_specs = [
        pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),  # W tile
        pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),  # H resident
        pl.BlockSpec((bm, Np), lambda j: (j, 0), memory_space=_VMEM),  # Ym stripe
    ]
    if explicit_ym2:
        in_specs.append(pl.BlockSpec((bm, Np), lambda j: (j, 0), memory_space=_VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((k, Mp), W.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * Mp * Np * k,
            bytes_accessed=Mp * Np * 4 * (2 if explicit_ym2 else 1),
            transcendentals=0,
        ),
        # Each m-stripe writes disjoint T columns with no accumulation, so
        # the grid dimension is truly parallel — lets Mosaic pipeline
        # stripes without revisit ordering constraints.
        compiler_params=_resident_params(dimension_semantics=("parallel",)),
        interpret=interpret,
    )
    args = (W, H_new, Ym) + ((Ym2,) if explicit_ym2 else ())
    return call(*args)


# ------------------------------------------------ bitpacked stripe variants
#
# The model's data is BINARY (the estimator enforces the reference's
# "X must be binary" contract, `_base.py:90-91`), so the (m, n) matrices the
# sweep streams from HBM can be packed 32 entries per int32 word — a 32x cut
# in both the HBM stream and the data's memory footprint.  Because unpacked
# values are exactly 0.0/1.0, every downstream formula collapses to a
# *select*:
#
#   p  = ym * (b*r)             ==  where(bit, b*r, 0)
#   q  = (1-ym) * (a*r)         ==  where(bit, 0, a*r)
#   ll = ym*log a + (1-ym)*log b == log(where(bit, a, b))   (ONE log, not 2)
#
# which is bit-identical to the dense stripe kernels (multiplying by an
# exact 0/1 and adding a signed zero is exact in IEEE arithmetic; the padded
# sums run in the same order) — asserted by tests/test_pallas.py.
#
# Packing layout (stripe-local bit planes along m, for stripe block bm):
#   word row w = j*bmw + i, bit b  <->  data row j*bm + b*bmw + i
# with bmw = bm // 32, so the in-kernel unpack — 32 shift-to-sign planes
# concatenated along sublanes — reproduces stripe j's rows in EXACT original
# order; no permutation exists anywhere.
#
# Measured (10^4 x 10^4, K=128, f32, v5e, hoist-proof slope timing,
# tools/bench_true.py): H pass 0.73 ms vs 0.85 dense, W pass 0.39 vs 0.48 —
# the gain is modest unmasked (the pass is MXU-bound; see
# docs/performance.md) but doubles for masked training, where the dense W
# pass streams TWO (m, n) arrays, and the 32x memory cut raises the
# max single-chip problem size accordingly.

PACKED_WORD_BITS = 32


def pack_bits(Ymp: jnp.ndarray, block_m: int) -> jnp.ndarray:
    """Pack a zero-padded binary ``(Mp, Np)`` matrix into ``(Mp//32, Np)``
    int32 words in the stripe-local bit-plane layout for stripe ``block_m``.

    Requires ``block_m % 32 == 0`` and ``Mp % block_m == 0`` (both are
    guaranteed by :func:`select_stripe` + :func:`pad_operands`).
    """
    Mp, Np = Ymp.shape
    bm = _pick_block(Mp, block_m)
    if bm % PACKED_WORD_BITS != 0 or Mp % bm != 0:
        raise ValueError(f"pack_bits: invalid stripe {block_m} for Mp={Mp}")
    bmw = bm // PACKED_WORD_BITS
    S = Mp // bm
    bits = Ymp.astype(jnp.int32).reshape(S, PACKED_WORD_BITS, bmw, Np)
    shifts = jnp.arange(PACKED_WORD_BITS, dtype=jnp.int32)[None, :, None, None]
    packed = jnp.bitwise_or.reduce(bits << shifts, axis=1)
    return packed.reshape(Mp // PACKED_WORD_BITS, Np)


def pack_bits_host(Ymp: np.ndarray, block_m: int) -> np.ndarray:
    """NumPy mirror of :func:`pack_bits` — identical words, computed on the
    host so callers can ship 1/32 the bytes over the host-device link
    (serving-path transfer optimization).  Asserted bit-equal to the device
    packer in the test suite."""
    Mp, Np = Ymp.shape
    bm = _pick_block(Mp, block_m)
    if bm % PACKED_WORD_BITS != 0 or Mp % bm != 0:
        raise ValueError(f"pack_bits_host: invalid stripe {block_m} for Mp={Mp}")
    bmw = bm // PACKED_WORD_BITS
    S = Mp // bm
    # np.packbits along a contiguous trailing 32-bit axis runs at C
    # memcpy-class speed (a broadcast shift + strided bitwise_or.reduce is
    # ~50x slower at 1e8 entries).  With bitorder="little", byte j of each
    # 4-byte group holds bits 8j..8j+7, so the little-endian uint32 view
    # has value bit b == plane bit b — exactly the device packer's layout.
    bits = np.ascontiguousarray(Ymp, dtype=np.uint8).reshape(
        S, PACKED_WORD_BITS, bmw, Np
    )
    bits = np.ascontiguousarray(np.moveaxis(bits, 1, -1))  # (S, bmw, Np, 32)
    words = np.packbits(bits, axis=-1, bitorder="little")  # (S, bmw, Np, 4) u8
    if not np.little_endian:  # pragma: no cover — TPU hosts are LE
        raise RuntimeError("pack_bits_host requires a little-endian host")
    return words.view(np.uint32).view(np.int32).reshape(
        Mp // PACKED_WORD_BITS, Np
    )


def unpack_bits(P: jnp.ndarray, block_m: int, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`pack_bits`: ``(Mp//32, Np)`` int32 words back to a
    dense ``(Mp, Np)`` 0/1 matrix (plain XLA ops; used for the occasional
    non-streaming pass over data that only exists packed)."""
    Mw, Np = P.shape
    Mp = Mw * PACKED_WORD_BITS
    bm = _pick_block(Mp, block_m)
    bmw = bm // PACKED_WORD_BITS
    S = Mp // bm
    words = P.reshape(S, bmw, Np)
    planes = jnp.stack(
        [(words << (31 - b)) < 0 for b in range(PACKED_WORD_BITS)], axis=1
    )  # (S, 32, bmw, Np) — same axis order pack_bits packed from
    return planes.reshape(Mp, Np).astype(dtype)


def _unpack_bitmask(pw: jnp.ndarray, bm: int) -> jnp.ndarray:
    """``(bmw, Np)`` int32 words -> ``(bm, Np)`` bool in original row order.

    Sign trick: left-shift bit ``b`` into the sign position and test ``< 0``
    — two cheap VPU ops per plane, no integer->float conversion anywhere.
    """
    planes = [(pw << (31 - b)) for b in range(PACKED_WORD_BITS)]
    return jnp.concatenate(planes, axis=0) < 0


def hloss_terms_packed(
    W: jnp.ndarray,
    H: jnp.ndarray,
    Yp: jnp.ndarray,
    Yp2: Optional[jnp.ndarray] = None,
    *,
    eps: float = 1e-8,
    block_m: int = 256,
    interpret: bool = False,
    precision=None,
):
    """Bitpacked fused H-update + loss pass (semantics of
    :func:`hloss_terms_stripe`).

    ``Yp`` packs ``Ym`` (= ``Y`` or ``Y*mask``).  ``Yp2=None`` selects the
    parity/unmasked complement ``1 - Ym`` (in-register); an explicit ``Yp2``
    (packing ``(1-Y)*mask``) serves ``mask_mode="corrected"``.
    """
    k, Mp = W.shape
    _, Np = H.shape
    bm = _pick_block(Mp, block_m)
    bmw = bm // PACKED_WORD_BITS
    grid = (Mp // bm,)
    acc = _acc_dtype(W.dtype)
    mxu = W.dtype
    corrected = Yp2 is not None

    def kernel(*refs):
        if corrected:
            w_ref, h_ref, yp_ref, yp2_ref, num_ref, den_ref, ll_ref = refs
        else:
            w_ref, h_ref, yp_ref, num_ref, den_ref, ll_ref = refs
            yp2_ref = None

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            num_ref[...] = jnp.zeros(num_ref.shape, num_ref.dtype)
            den_ref[...] = jnp.zeros(den_ref.shape, den_ref.dtype)
            ll_ref[0, 0] = jnp.zeros((), acc)

        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        bit = _unpack_bitmask(yp_ref[...], bm)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )  # (bm, Np)
        a = wh + eps
        b = jnp.maximum(1.0 - wh, 0.0) + eps  # exact when wh <= 1; guards f32 wh>1 rounding
        r = 1.0 / (a * b)
        p = jnp.where(bit, b * r, 0.0)
        if corrected:
            bit2 = _unpack_bitmask(yp2_ref[...], bm)
            q = jnp.where(bit2, a * r, 0.0)
            # Unobserved entries (neither bit set) contribute log(1) = 0.
            ll = jnp.log(jnp.where(bit, a, jnp.where(bit2, b, 1.0)))
        else:
            q = jnp.where(bit, 0.0, a * r)
            ll = jnp.log(jnp.where(bit, a, b))
        num_ref[...] += jax.lax.dot_general(
            w, p.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        den_ref[...] += jax.lax.dot_general(
            w, q.astype(mxu), (((1,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        # Pad bias analysis as in hloss_terms_stripe: pad elements add the
        # constant log(1 + eps) <= 1e-8 each (exactly 0 in corrected mode).
        ll_ref[0, 0] += jnp.sum(ll)

    in_specs = [
        pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),  # W tile
        pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),  # H resident
        pl.BlockSpec((bmw, Np), lambda j: (j, 0), memory_space=_VMEM),  # words
    ]
    if corrected:
        in_specs.append(pl.BlockSpec((bmw, Np), lambda j: (j, 0), memory_space=_VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=_SMEM if pltpu else pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((k, Np), W.dtype),
            jax.ShapeDtypeStruct((1, 1), acc),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * Np * k,
            bytes_accessed=Mp * Np // 8 * (2 if corrected else 1),
            transcendentals=Mp * Np,
        ),
        compiler_params=_resident_params(),
        interpret=interpret,
    )
    args = (W, H, Yp) + ((Yp2,) if corrected else ())
    Num, Den, ll = call(*args)
    return Num, Den, ll[0, 0]


def w_terms_packed(
    W: jnp.ndarray,
    H_new: jnp.ndarray,
    Yp: jnp.ndarray,
    Yp2: Optional[jnp.ndarray] = None,
    *,
    n_real: int,
    eps: float = 1e-8,
    block_m: int = 256,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Bitpacked W-update contraction (semantics of :func:`w_terms_stripe`).

    ``Yp2=None`` synthesizes the unmasked complement with column validity;
    an explicit ``Yp2`` (packing ``(1-Y)*mask``) serves both masked modes
    (their W update uses the same masked complement).
    """
    k, Mp = W.shape
    _, Np = H_new.shape
    bm = _pick_block(Mp, block_m)
    bmw = bm // PACKED_WORD_BITS
    grid = (Mp // bm,)
    acc = _acc_dtype(W.dtype)
    mxu = W.dtype
    explicit2 = Yp2 is not None

    def kernel(*refs):
        if explicit2:
            w_ref, h_ref, yp_ref, yp2_ref, t_ref = refs
        else:
            w_ref, h_ref, yp_ref, t_ref = refs
            yp2_ref = None

        w = w_ref[...].astype(mxu)
        h = h_ref[...].astype(mxu)
        bit = _unpack_bitmask(yp_ref[...], bm)
        wh = jax.lax.dot_general(
            w, h, (((0,), (0,)), ((), ())), preferred_element_type=acc, precision=precision
        )
        a = wh + eps
        b = jnp.maximum(1.0 - wh, 0.0) + eps  # exact when wh <= 1; guards f32 wh>1 rounding
        r = 1.0 / (a * b)
        p = jnp.where(bit, b * r, 0.0)
        if explicit2:
            bit2 = _unpack_bitmask(yp2_ref[...], bm)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (bm, Np), 1)
            bit2 = jnp.logical_and(jnp.logical_not(bit), col < n_real)
        q = jnp.where(bit2, a * r, 0.0)
        # Two-matmul all-nonnegative form — see w_terms for why the
        # one-matmul cancellation identity is forbidden on the MXU; also
        # keeps this path bit-identical to w_terms_stripe.
        t_ref[...] = jax.lax.dot_general(
            h, p.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        ) + jax.lax.dot_general(
            1.0 - h, q.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=acc, precision=precision,
        )

    in_specs = [
        pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),  # W tile
        pl.BlockSpec((k, Np), lambda j: (0, 0), memory_space=_VMEM),  # H resident
        pl.BlockSpec((bmw, Np), lambda j: (j, 0), memory_space=_VMEM),  # words
    ]
    if explicit2:
        in_specs.append(pl.BlockSpec((bmw, Np), lambda j: (j, 0), memory_space=_VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, bm), lambda j: (0, j), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((k, Mp), W.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * Mp * Np * k,
            bytes_accessed=Mp * Np // 8 * (2 if explicit2 else 1),
            transcendentals=0,
        ),
        compiler_params=_resident_params(dimension_semantics=("parallel",)),
        interpret=interpret,
    )
    args = (W, H_new, Yp) + ((Yp2,) if explicit2 else ())
    return call(*args)


def select_stripe(k: int, Mp: int, Np: int, n_data: int,
                  budget_bytes: int = 88 * 1024 * 1024, packed: bool = False):
    """Pick the stripe-kernel block_m if the full-width stripes fit VMEM.

    Estimate per grid step: double-buffered data stripes (``n_data`` (m, n)
    arrays — 32x smaller words when ``packed``), stripe-sized f32
    intermediates (~3 dense: wh, p, q; ~5 packed: + the unpacked plane
    concat and mask), the resident (k, Np) outputs + H, and the W tile.
    Returns ``(use_stripe, block_m)``.
    """
    n_inter = 5 if packed else 3
    for bm in (256, 128):
        data_rows = (bm // PACKED_WORD_BITS) if packed else bm
        need = (
            2 * n_data * data_rows * Np + n_inter * bm * Np + 4 * k * Np + 2 * k * bm
        ) * 4
        if need <= budget_bytes and Mp % _pick_block(Mp, bm) == 0:
            eff = _pick_block(Mp, bm)
            if packed and eff % PACKED_WORD_BITS != 0:
                continue
            # The packed-words stripe block is (bm/32, Np); Mosaic requires
            # its second-minor dim divisible by 8 (or equal to the full
            # words-array rows Mp/32).  bm=128 gives 4 word rows — illegal
            # on hardware (legal in interpret mode, so CPU fuzz never saw
            # it).  Found by the K=256 row of tools/bench_shapes.py, where
            # the VMEM budget rejects bm=256 and fell through to bm=128.
            if (
                packed
                and (eff // PACKED_WORD_BITS) % 8 != 0
                and eff != Mp
            ):
                continue
            return True, bm
    return False, None


# ------------------------------------------------------------- padding glue
def pad_operands(
    Ym,
    Ym2,
    Yc,
    W0,
    H0,
    *,
    masked: bool,
    mask_mode: str = "parity",
    block_m=DEFAULT_BLOCK,
    block_n=DEFAULT_BLOCK,
):
    """Zero-pad the solver operands to block multiples.

    Returns ``(Ymp, Ym2p, Ycp, W0p, H0p, (m, n))`` where ``Ym2p``/``Ycp`` are
    ``None`` when the kernels can synthesize the complement in-register:
    the unmasked case needs neither extra array; parity-masked needs ``Ym2``
    only (its ``Yc == 1 - Ym`` everywhere); corrected-masked needs both
    (``Yc == Ym2 == (1-Y)*mask``, which is *not* ``1 - Ym``).
    """
    m, n = Ym.shape
    Mp = round_up(m, _pick_block(m, block_m))
    Np = round_up(n, _pick_block(n, block_n))

    def pad_mn(A):
        return jnp.pad(A, ((0, Mp - m), (0, Np - n)))

    Ymp = pad_mn(Ym)
    Ym2p = pad_mn(Ym2) if masked else None
    Ycp = pad_mn(Yc) if (masked and mask_mode == "corrected") else None

    def pad_last(A, target):
        pad = [(0, 0)] * (A.ndim - 1) + [(0, target - A.shape[-1])]
        return jnp.pad(A, pad)

    W0p = pad_last(W0, Mp)  # zero pad columns (works for (k,m) and (b,k,m))
    H0p = pad_last(H0, Np)
    return Ymp, Ym2p, Ycp, W0p, H0p, (m, n)


def apply_col_validity(H: jnp.ndarray, n_real: int) -> jnp.ndarray:
    """Zero H's pad columns (beyond ``n_real``) after an elementwise update."""
    k, Np = H.shape
    if Np == n_real:
        return H
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    return jnp.where(col < n_real, H, 0.0)

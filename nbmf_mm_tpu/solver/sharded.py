"""Sharded fused solver: Pallas sweep kernels inside ``shard_map`` over a
2-D device mesh.

The GSPMD path (:mod:`nbmf_mm_tpu.parallel.sharding`) lets XLA partition the
*XLA* kernels automatically; this module is the multi-chip **fast** path: the
fused 2-pass Pallas kernels run on each device's local block of the data and
the cross-device reductions are explicit collectives —

- H+loss pass: local ``(Num, Den, ll)`` partials from the local ``m`` block,
  then ``psum`` over the ``rows`` axis (``ll`` over both axes);
- W pass: local ``T`` partials from the local ``n`` block, ``psum`` over
  ``cols``.

Those are exactly the reductions the math requires; everything else
(elementwise factor updates, the convergence test) is local and replicated-
consistent because the psum'd loss is identical on every device.  Layouts
put the collectives on ICI: per sweep each device exchanges only
``(k, n_local) + (k, m_local)`` floats — the big ``(m, n)`` data never moves.

Padding contract (different from the single-chip path): every operand is
padded so each *shard* is block-aligned, the complements ``Ym2``/``Yc`` are
always materialized with zero pads (pad entries then contribute exactly
nothing to every contraction and to the loss, with no in-kernel validity
masks), and a column-validity vector ``Vn`` (sharded like ``H``) keeps H's
pad columns at zero and excludes them from the Beta-prior sums.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pallas_sweep as ps
from ..ops.projection import project_columns_simplex_duchi
from ..ops.updates import clip_upper_interior

__all__ = [
    "solve_core_sharded",
    "plan_shard_padding",
    "pack_words_for_mesh",
    "mesh_pack_geometry",
]


def mesh_pack_geometry(
    m: int,
    n: int,
    n_components: int,
    *,
    mesh: Mesh,
    mesh_axes: Tuple[str, str],
    block_m: int,
    block_n: int,
):
    """Derive the per-shard packed-stripe geometry for an ``(m, n)`` solve
    at rank ``n_components`` over ``mesh`` — exactly as the in-loop packer
    derives it (``select_stripe`` then the packers' ``_pick_block``
    shrink).  Returns ``(ok, Mp, Np, eff_bm)``; ``ok`` is False when the
    local geometry cannot run the packed kernels or shard boundaries would
    split a stripe.  Cheap (no data touched) — the solver driver gates the
    sparse-ingestion fast path on it BEFORE any packing work.
    """
    rows, cols = mesh_axes
    n_rows, n_cols = mesh.shape[rows], mesh.shape[cols]
    Mp, _ = plan_shard_padding(m, n_rows, block_m)
    Np, _ = plan_shard_padding(n, n_cols, block_n)
    m_loc, n_loc = Mp // n_rows, Np // n_cols
    ok, pack_bm = ps.select_stripe(
        int(n_components), m_loc, n_loc, 3, packed=True
    )
    if not ok:
        return False, Mp, Np, 0
    eff = ps._pick_block(m_loc, pack_bm)
    if eff % ps.PACKED_WORD_BITS or m_loc % eff:
        return False, Mp, Np, 0
    return True, Mp, Np, eff


def pack_words_for_mesh(
    Y,
    mask,
    *,
    mesh: Mesh,
    mesh_axes: Tuple[str, str],
    n_components: int,
    block_m: int,
    block_n: int,
    mask_mode: str = "parity",
):
    """Build the ``(Ymw, Ym2w, Ycw)`` pre-packed word arrays for
    :func:`solve_core_sharded` ``packed_words=`` from ``scipy.sparse``
    operands — chunk-by-chunk, so no dense copy of the matrix ever exists.

    ``Y`` (and ``mask``, if given) must be canonical exactly-binary CSR
    (see ``ops.packed.csr_binary_canonical``; the solver driver validates
    before calling).  The three operands follow the sharded padding
    contract (module docstring): ``Ym = Y*mask``, ``Ym2 = (1-Y)*mask``,
    ``Yc`` = parity complement ``1 - Ym`` (zero pads) or the corrected
    alias ``Ym2`` — only ``Ym``/``Ym2`` are sparse; the complements are
    built one transient row-chunk at a time.  Raises when the per-shard
    stripe geometry cannot run the packed kernels (there is no dense
    fallback for words).  Returns ``(Ymw, Ym2w, Ycw)`` as int32 numpy
    arrays of shape ``(Mp//32, Np)``.
    """
    from ..ops.packed import pack_sparse_words

    m, n = Y.shape
    ok, Mp, Np, eff_bm = mesh_pack_geometry(
        m, n, n_components,
        mesh=mesh, mesh_axes=mesh_axes, block_m=block_m, block_n=block_n,
    )
    if not ok:
        raise ValueError(
            f"per-shard geometry (k={n_components}, mesh {dict(mesh.shape)})"
            " is not stripe-eligible for the packed kernels"
        )
    if mask is not None:
        Ym_s = Y.multiply(mask).tocsr()
        Ym2_s = (mask - Ym_s).tocsr()
    else:
        Ym_s, Ym2_s = Y, None

    wm = pack_sparse_words(Ym_s, Mp, Np, eff_bm)
    if Ym2_s is not None:
        wm2 = pack_sparse_words(Ym2_s, Mp, Np, eff_bm)
    else:  # unmasked: Ym2 is the complement (dense as sparse, free as bits)
        wm2 = pack_sparse_words(Ym_s, Mp, Np, eff_bm, complement=True)
    if mask is None or mask_mode == "corrected":
        wc = wm2  # corrected aliases Ym2; unmasked complement == Ym2 too
    else:  # parity: Yc = 1 - Ym in the real region, zero pads
        wc = pack_sparse_words(Ym_s, Mp, Np, eff_bm, complement=True)
    return wm, wm2, wc


def plan_shard_padding(dim: int, n_shards: int, block: int) -> Tuple[int, int]:
    """Padded global size and per-shard Pallas block for ``dim`` split over
    ``n_shards`` devices.  The local size is lane-aligned (128) and either a
    multiple of ``block`` or itself the block."""
    local = -(-dim // n_shards)  # ceil
    local = ps.round_up(local, 128)
    if local >= block:
        local = ps.round_up(local, block)
        blk = block
    else:
        blk = local
    return local * n_shards, blk


def solve_core_sharded(
    Ym,
    Ym2,
    Yc,
    W0,
    H0,
    alpha,
    beta,
    tol,
    n_obs,
    *,
    mesh: Mesh,
    mesh_axes: Tuple[str, str],
    max_iter: int,
    projection: str,
    eps: float,
    m_real: int,
    n_real: int,
    block_m: int,
    block_n: int,
    interpret: bool = False,
    data_dtype=None,
    packed: bool = False,
    packed_required: bool = False,
    mxu_precision=None,
    packed_words=None,
):
    """Run the shifted-loss 2-pass loop with per-shard Pallas kernels.

    ``packed=True`` (caller guarantees exactly-binary operands) bitpacks
    each device's LOCAL data blocks inside the shard_map and runs the
    packed stripe kernels per shard — the collectives are unchanged (they
    move ``(k, ·)`` factor terms, never data).  Falls back to the dense
    tiled kernels when the local stripe geometry doesn't fit VMEM.

    ``packed_words`` (sparse-ingestion fast path): a ``(Ymw, Ym2w, Ycw)``
    tuple of pre-packed int32 bit-plane arrays shaped ``(Mp//32, Np)`` in
    the stripe-local layout of exactly the per-shard geometry this
    function derives (``pack_words_for_mesh`` builds them from
    ``scipy.sparse`` operands chunk-by-chunk).  Dense ``Ym``/``Ym2``/``Yc``
    are then ignored (pass ``None``) — the data never exists dense, host
    or device.  Requires ``packed=True``-eligible local geometry (raises
    otherwise: the words cannot run the dense kernels).

    Inputs are *unpadded* device-agnostic arrays in the internal layout with
    a leading restart axis: ``W0 (b, k, m)`` unit-column-sum, ``H0 (b, k,
    n)`` — the restart axis is ``vmap``-ed *inside* the shard_map (every
    restart advances in lockstep on every shard).  This function plans the
    shard-aligned padding, places the operands, and returns unpadded batched
    results ``(W, H, losses, n_iter, final_loss, done)``.
    """
    rows, cols = mesh_axes
    n_rows, n_cols = mesh.shape[rows], mesh.shape[cols]
    m, n = (m_real, n_real) if packed_words is not None else Ym.shape
    _, k, _ = W0.shape
    dtype = W0.dtype

    Mp, bm = plan_shard_padding(m, n_rows, block_m)
    Np, bn = plan_shard_padding(n, n_cols, block_n)

    W0p = jnp.pad(W0, ((0, 0), (0, 0), (0, Mp - m)))
    H0p = jnp.pad(H0, ((0, 0), (0, 0), (0, Np - n)))
    Vn = (jnp.arange(Np)[None, :] < n_real).astype(dtype)  # (1, Np)

    dsh = NamedSharding(mesh, P(rows, cols))
    wsh = NamedSharding(mesh, P(None, None, rows))
    hsh = NamedSharding(mesh, P(None, None, cols))
    W0p = jax.device_put(W0p, wsh)
    H0p = jax.device_put(H0p, hsh)
    Vn = jax.device_put(Vn, NamedSharding(mesh, P(None, cols)))

    m_loc, n_loc = Mp // n_rows, Np // n_cols
    kw = dict(block_m=bm, block_n=bn, interpret=interpret,
              precision=mxu_precision)

    # Per-shard bitpacking decision (static): the caller vouches the
    # operands are exactly binary; here we only need the local stripe
    # geometry to fit.  Local m is 128-aligned by plan_shard_padding, so a
    # 128-row stripe always divides it.
    use_packed, pack_bm = False, None
    if packed or packed_words is not None:
        use_packed, pack_bm = ps.select_stripe(k, m_loc, n_loc, 3, packed=True)
    if (packed_required or packed_words is not None) and not use_packed:
        # solve(packed=True): an explicit demand must not silently run dense
        # (and pre-packed words CANNOT run dense — there is no dense data).
        raise ValueError(
            "packed=True: the per-device local stripe geometry "
            f"(k={k}, m_loc={m_loc}, n_loc={n_loc}) is not stripe-eligible"
        )

    if packed_words is not None:
        # Same effective-stripe shrink the packers apply (_pick_block): the
        # words must have been packed with it (pack_words_for_mesh does).
        _eff = ps._pick_block(m_loc, pack_bm)
        if m_loc % _eff != 0:  # pragma: no cover - 128-aligned local dims
            raise ValueError(
                f"m_loc={m_loc} is not a multiple of the effective stripe "
                f"{_eff}: per-shard word blocks would split a stripe"
            )
        want = (Mp // ps.PACKED_WORD_BITS, Np)
        for name, Aw in zip(("Ym", "Ym2", "Yc"), packed_words):
            if tuple(Aw.shape) != want:
                raise ValueError(
                    f"packed_words[{name}] has shape {tuple(Aw.shape)}, "
                    f"expected {want} (pack with pack_words_for_mesh for "
                    "this mesh/shape/rank)"
                )
        Ymp, Ym2p, Ycp = (
            jax.device_put(jnp.asarray(Aw), dsh) for Aw in packed_words
        )
    else:
        def pad_mn(A):
            return jnp.pad(A, ((0, Mp - m), (0, Np - n)))

        Ymp = pad_mn(Ym)
        Ym2p = pad_mn(Ym2)
        # Parity mode aliases Yc == 1 - Ym *inside the real region*; pads
        # must be zero, so always materialize the complement explicitly.
        Ycp = pad_mn(Yc)
        if data_dtype is not None:
            Ymp, Ym2p, Ycp = (A.astype(data_dtype) for A in (Ymp, Ym2p, Ycp))
        Ymp = jax.device_put(Ymp, dsh)
        Ym2p = jax.device_put(Ym2p, dsh)
        Ycp = jax.device_put(Ycp, dsh)

    prepacked = packed_words is not None

    def local_loop(Ym_l, Ym2_l, Yc_l, W_b0, H_b0, Vn_l, alpha, beta, tol, n_obs):
        if use_packed:
            # Parity mode keeps THREE distinct binary operands (Ym = Y*mask,
            # Ym2 = (1-Y)*mask, Yc = 1-Ym with zero pads); pack each local
            # block once, outside the while_loop — unless the caller shipped
            # pre-packed words (sparse ingestion), which ARE the local
            # blocks already (stripe-aligned shard boundaries).
            if prepacked:
                Ymp_l, Ym2p_l, Ycp_l = Ym_l, Ym2_l, Yc_l
            else:
                Ymp_l = ps.pack_bits(Ym_l, pack_bm)
                Ym2p_l = ps.pack_bits(Ym2_l, pack_bm)
                Ycp_l = ps.pack_bits(Yc_l, pack_bm)
            hloss_local = lambda W_l, H_l: ps.hloss_terms_packed(
                W_l, H_l, Ymp_l, Ycp_l, eps=eps, block_m=pack_bm,
                interpret=interpret, precision=mxu_precision,
            )
            wterms_local = lambda W_l, H_new: ps.w_terms_packed(
                W_l, H_new, Ymp_l, Ym2p_l, n_real=n_real, eps=eps,
                block_m=pack_bm, interpret=interpret, precision=mxu_precision,
            )
        else:
            hloss_local = lambda W_l, H_l: ps.hloss_terms(
                W_l, H_l, Ym_l, Yc_l, eps=eps, m_real=m_loc, n_real=n_loc, **kw
            )
            wterms_local = lambda W_l, H_new: ps.w_terms(
                W_l, H_new, Ym_l, Ym2_l, n_real=n_real, eps=eps, **kw
            )
        def objective_from_ll(ll_partial, H_l):
            ll = jax.lax.psum(ll_partial, (rows, cols))
            # Beta-prior sums over the real columns only (Vn zeroes pads);
            # H is replicated over `rows`, sharded over `cols`.
            pa = (alpha - 1.0) * jax.lax.psum(
                jnp.sum(jnp.log(H_l + eps) * Vn_l), cols
            )
            pb = (beta - 1.0) * jax.lax.psum(
                jnp.sum(jnp.log(1.0 - H_l + eps) * Vn_l), cols
            )
            return (-(ll + pa + pb) / n_obs).astype(dtype)

        def finish_sweep(W_l, H_l, Num, Den):
            num = H_l * Num + (alpha - 1.0)
            den = (1.0 - H_l) * Den + (beta - 1.0)
            # dtype-aware upper bound (ops.updates.clip_upper_interior)
            H_new = jnp.clip(
                num / (num + den + eps), eps,
                clip_upper_interior(eps, W_l.dtype),
            ) * Vn_l
            T = jax.lax.psum(wterms_local(W_l, H_new), cols)
            W_raw = W_l * T
            if projection == "normalize":
                W_new = W_raw / n_real
                col_sums = W_new.sum(axis=0, keepdims=True)
                W_new = W_new / jnp.where(col_sums > 0, col_sums, 1.0)
            else:
                W_new = project_columns_simplex_duchi(W_raw / n_real)
                # re-zero pad columns (all-zero cols project to uniform)
                zero_cols = W_l.sum(axis=0, keepdims=True) == 0
                W_new = jnp.where(zero_cols, 0.0, W_new)
            return W_new, H_new

        losses0 = jnp.zeros((max_iter,), dtype=dtype)

        def cond(carry):
            _, _, _, _, it, done = carry
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        # (cond/body below operate on ONE restart; the restart axis is
        # vmapped at the bottom — the freeze semantics make that exact.)

        def body(carry):
            W_l, H_l, losses, prev1, it, done = carry
            Num_p, Den_p, ll_p = hloss_local(W_l, H_l)
            Num = jax.lax.psum(Num_p, rows)
            Den = jax.lax.psum(Den_p, rows)
            loss_cur = objective_from_ll(ll_p, H_l)
            rec = jnp.logical_and(it >= 1, jnp.logical_not(done))
            losses = jnp.where(
                rec, losses.at[jnp.maximum(it - 1, 0)].set(loss_cur), losses
            )
            rel_change = jnp.abs(prev1 - loss_cur) / jnp.abs(prev1)
            newly_done = jnp.logical_and(it >= 2, rel_change < tol)
            done_out = jnp.logical_or(done, newly_done)
            W_new, H_new = finish_sweep(W_l, H_l, Num, Den)
            W_out = jnp.where(done_out, W_l, W_new)
            H_out = jnp.where(done_out, H_l, H_new)
            prev_out = jnp.where(rec, loss_cur, prev1)
            it_out = jnp.where(done_out, it, it + 1)
            return (W_out, H_out, losses, prev_out, it_out, done_out)

        def one_restart(W_l0, H_l0):
            init = (
                W_l0,
                H_l0,
                losses0,
                jnp.array(jnp.inf, dtype=dtype),
                jnp.array(0, dtype=jnp.int32),
                jnp.array(False),
            )
            W_l, H_l, losses, prev1, n_iter, done = jax.lax.while_loop(
                cond, body, init
            )

            # Final-loss fill on max_iter exhaustion (single-chip core dito).
            _, _, ll_p = hloss_local(W_l, H_l)
            loss_fin = objective_from_ll(ll_p, H_l)
            need_final = jnp.logical_not(done)
            losses = jnp.where(
                need_final, losses.at[jnp.maximum(n_iter - 1, 0)].set(loss_fin), losses
            )
            final_loss = jnp.where(need_final, loss_fin, prev1)
            rel_fin = jnp.abs(prev1 - loss_fin) / jnp.abs(prev1)
            done = jnp.logical_or(
                done,
                jnp.logical_and(
                    need_final, jnp.logical_and(n_iter >= 2, rel_fin < tol)
                ),
            )
            return W_l, H_l, losses, n_iter, final_loss, done

        return jax.vmap(one_restart)(W_b0, H_b0)

    mapped = jax.shard_map(
        local_loop,
        mesh=mesh,
        in_specs=(
            P(rows, cols),  # Ym
            P(rows, cols),  # Ym2
            P(rows, cols),  # Yc
            P(None, None, rows),  # W (restart axis leading)
            P(None, None, cols),  # H
            P(None, cols),  # Vn
            P(), P(), P(), P(),  # scalars
        ),
        out_specs=(
            P(None, None, rows),  # W
            P(None, None, cols),  # H
            P(),  # losses (b, max_iter)
            P(),  # n_iter (b,)
            P(),  # final_loss (b,)
            P(),  # done (b,)
        ),
        check_vma=False,
    )
    mapped = jax.jit(mapped)
    W, H, losses, n_iter, final_loss, done = mapped(
        Ymp, Ym2p, Ycp, W0p, H0p, Vn, alpha, beta, tol, n_obs
    )
    return W[:, :, :m], H[:, :, :n], losses, n_iter, final_loss, done

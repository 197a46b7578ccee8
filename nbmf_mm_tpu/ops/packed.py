"""First-class bitpacked data input: build and hold a binary matrix as int32
bit-plane words without ever materializing it dense.

The bitpacked stripe kernels (:mod:`nbmf_mm_tpu.ops.pallas_sweep`) stream 32
matrix entries per int32 word — on a single chip that cuts the data stream
*and the data's HBM footprint* by 32x, which moves the largest-solvable
problem from "what fits dense in HBM" to "what fits packed".  ``solve()``
reaches the packed kernels automatically for dense binary inputs, but the
dense staging itself (host array -> device f32 -> pad -> pack) then becomes
the memory ceiling: a 4x10^5 x 10^4 matrix is 16 GB dense f32 and only
0.5 GB packed.  This module removes that ceiling:

- :class:`PackedMatrix` — the packed words plus the real (unpadded) shape
  and the stripe geometry they were packed for;
- :func:`pack_matrix` — pack a dense matrix (host or device) into one;
- :func:`pack_matrix_chunked` — build one from row chunks produced on
  demand (a generator/callback), so no dense copy of the full matrix ever
  exists anywhere; chunks are packed as they arrive.

``solve(PackedMatrix, ...)`` runs the packed stripe kernels directly
(single-chip Pallas path; see the ``solve`` docstring for the contract).

The reference has no counterpart (its NumPy solver materializes ~6 dense
(m, n) temporaries per sweep, ``src/nbmf_mm/_solver.py:22-57``); this is a
TPU-native scale capability.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_sweep as ps

__all__ = [
    "PackedMatrix",
    "csr_binary_canonical",
    "pack_matrix",
    "pack_matrix_chunked",
    "pack_matrix_sparse",
    "pack_sparse_words",
    "plan_packing",
]


def csr_binary_canonical(S):
    """CSR view of a scipy.sparse matrix with canonical (duplicate-summed)
    data, or ``None`` if its dense-equivalent stored values are not exactly
    0/1.  Never mutates the input: duplicate entries SUM in the dense view
    (two stored 1.0s at one position are dense 2.0), so non-canonical
    inputs canonicalize on a COPY before the binaryness check — non-binary
    sums are rejected, not silently packed as one bit.
    """
    Sr = S.tocsr()  # normalizes .data layout across formats (lil/dia/bsr/...)
    if not Sr.has_canonical_format:
        Sr = Sr.copy()
        Sr.sum_duplicates()
    if Sr.data.size and not bool(((Sr.data == 0) | (Sr.data == 1)).all()):
        return None
    return Sr


@dataclass(frozen=True)
class PackedMatrix:
    """A zero-padded binary matrix stored as stripe-local bit-plane words.

    ``words`` is ``(Mp // 32, Np)`` int32 (``Mp``/``Np`` the padded sizes),
    ``shape`` the real ``(m, n)``, ``block_m`` the stripe height the words
    were packed for (the layout is stripe-local — words only combine with
    kernels using the same ``block_m``).  Pad rows/columns must be zero
    (the packers here guarantee it).
    """

    words: jnp.ndarray
    shape: Tuple[int, int]
    block_m: int

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return self.words.shape[0] * ps.PACKED_WORD_BITS, self.words.shape[1]

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.words.shape)) * 4

    def unpack(self) -> jnp.ndarray:
        """Dense 0/1 float32 ``(m, n)`` (for tests/small inspections)."""
        m, n = self.shape
        return ps.unpack_bits(self.words, self.block_m)[:m, :n]


def plan_packing(
    m: int, n: int, k: int, *, block_m: Optional[int] = None,
    block_n: Optional[int] = None,
) -> Tuple[int, int, int]:
    """Padded sizes and stripe height for packing an ``(m, n)`` matrix to be
    solved at rank ``k`` — exactly the geometry ``solve()`` would derive for
    a dense binary input, so a :class:`PackedMatrix` built here hits the
    same kernels bit-identically.  Returns ``(Mp, Np, pack_bm)``; raises if
    the (k, Np) resident geometry cannot run the packed stripe kernels.
    """
    bm = block_m or ps.DEFAULT_BLOCK
    bn = block_n or ps.DEFAULT_BLOCK
    Mp = ps.round_up(m, ps._pick_block(m, bm))
    Np = ps.round_up(n, ps._pick_block(n, bn))
    can_pack, pack_bm = ps.select_stripe(k, Mp, Np, 1, packed=True)
    if not can_pack:
        raise ValueError(
            f"(k={k}, Mp={Mp}, Np={Np}) is not stripe-eligible for the "
            "packed kernels: the (k, Np)-resident outputs exceed the VMEM "
            "budget — reduce n (or k), or shard over a mesh"
        )
    return Mp, Np, pack_bm


def pack_matrix(
    Y, k: int, *, block_m: Optional[int] = None, block_n: Optional[int] = None
) -> PackedMatrix:
    """Pack a dense exactly-binary ``(m, n)`` matrix (numpy or jax array).

    Host arrays are packed on the host (the data then crosses the
    host-device link at 1/32 the bytes); device arrays are packed on-device.
    """
    m, n = Y.shape
    Mp, Np, pack_bm = plan_packing(m, n, k, block_m=block_m, block_n=block_n)
    if isinstance(Y, np.ndarray):
        if not bool(((Y == 0) | (Y == 1)).all()):
            raise ValueError("pack_matrix requires exactly binary data")
        Yp = np.zeros((Mp, Np), dtype=np.uint8)
        Yp[:m, :n] = Y
        words = jnp.asarray(ps.pack_bits_host(Yp, pack_bm))
    else:
        if not bool(jnp.all((Y == 0) | (Y == 1))):
            raise ValueError("pack_matrix requires exactly binary data")
        Yp = jnp.pad(Y.astype(jnp.float32), ((0, Mp - m), (0, Np - n)))
        words = jax.jit(ps.pack_bits, static_argnums=1)(Yp, pack_bm)
    return PackedMatrix(words=words, shape=(m, n), block_m=pack_bm)


def pack_matrix_chunked(
    row_chunk: Callable[[int, int], "np.ndarray | jnp.ndarray"],
    m: int,
    n: int,
    k: int,
    *,
    chunk_rows: Optional[int] = None,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    validate: bool = True,
) -> PackedMatrix:
    """Build a :class:`PackedMatrix` from on-demand row chunks.

    ``row_chunk(start, stop)`` must return the dense rows ``[start, stop)``
    of the matrix (``stop - start`` rows by ``n`` columns; numpy or device
    array, any 0/1 dtype).  The stripe-local packed layout makes row-chunk
    packing exact: chunks aligned to the stripe height concatenate into
    exactly ``pack_bits`` of the whole matrix, so only one chunk is ever
    dense.  Peak memory is ``chunk_rows * Np`` dense plus the packed words.

    ``chunk_rows`` defaults to ~2^26 entries' worth of rows, rounded to the
    stripe height.  Set ``validate=False`` to skip the per-chunk binaryness
    scan (e.g. chunks straight from ``jax.random.bernoulli``).
    """
    Mp, Np, pack_bm = plan_packing(m, n, k, block_m=block_m, block_n=block_n)
    if chunk_rows is None:
        chunk_rows = max(pack_bm, ((1 << 26) // max(Np, 1)) // pack_bm * pack_bm)
    chunk_rows = ps.round_up(chunk_rows, pack_bm)
    pack_dev = jax.jit(ps.pack_bits, static_argnums=1)

    parts = []
    for start in range(0, Mp, chunk_rows):
        stop = min(start + chunk_rows, Mp)
        real_stop = min(stop, m)
        rows = real_stop - start
        if rows > 0:
            C = row_chunk(start, real_stop)
            if C.shape != (rows, n):
                raise ValueError(
                    f"row_chunk({start}, {real_stop}) returned shape "
                    f"{C.shape}, expected {(rows, n)}"
                )
        else:
            C = None  # fully inside the row padding
        if isinstance(C, np.ndarray):
            if validate and not bool(((C == 0) | (C == 1)).all()):
                raise ValueError(
                    f"rows [{start}, {real_stop}) are not exactly binary"
                )
            Cp = np.zeros((stop - start, Np), dtype=np.uint8)
            Cp[:rows, :n] = C
            parts.append(jnp.asarray(ps.pack_bits_host(Cp, pack_bm)))
        else:
            if C is None:
                Cd = jnp.zeros((stop - start, Np), dtype=jnp.float32)
            else:
                if validate and not bool(jnp.all((C == 0) | (C == 1))):
                    raise ValueError(
                        f"rows [{start}, {real_stop}) are not exactly binary"
                    )
                Cd = jnp.pad(
                    C.astype(jnp.float32),
                    ((0, (stop - start) - rows), (0, Np - n)),
                )
            parts.append(pack_dev(Cd, pack_bm))
    words = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return PackedMatrix(words=words, shape=(m, n), block_m=pack_bm)


def pack_sparse_words(
    S,
    Mp: int,
    Np: int,
    block_m: int,
    *,
    complement: bool = False,
    chunk_rows: Optional[int] = None,
) -> np.ndarray:
    """Chunked sparse→stripe-words host packer: bit-identical to
    ``pack_bits_host(padded_dense, block_m)`` on the ``(Mp, Np)``
    zero-padded dense equivalent, built one transient row-chunk at a time.

    ``complement=True`` packs ``1 - S`` over the real region (pads stay
    zero) — the parity-mode/unmasked complement operand, which is dense as
    a sparse matrix but free as bits.  The effective stripe is derived
    exactly as the packers derive it (``_pick_block`` shrink), and chunk
    heights are kept multiples of it so every chunk packs with the same
    stripe as the whole matrix would.
    """
    m, n = S.shape
    eff = ps._pick_block(Mp, block_m)
    if eff % ps.PACKED_WORD_BITS or Mp % eff:
        raise ValueError(
            f"pack_sparse_words: stripe {block_m} (effective {eff}) does "
            f"not divide Mp={Mp}"
        )
    if chunk_rows is None:
        chunk = max(eff, ((1 << 26) // max(Np, 1)) // eff * eff)
    else:
        chunk = max(eff, chunk_rows // eff * eff)
    parts = []
    for start in range(0, Mp, chunk):
        stop = min(start + chunk, Mp)
        real = min(stop, m)
        C = np.zeros((stop - start, Np), dtype=np.uint8)
        if real > start:
            D = np.asarray(S[start:real].toarray(), dtype=np.uint8)
            C[: real - start, :n] = (1 - D) if complement else D
        parts.append(ps.pack_bits_host(C, eff))
    return np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def pack_matrix_sparse(
    Y,
    k: int,
    *,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    chunk_rows: Optional[int] = None,
) -> PackedMatrix:
    """Pack a scipy.sparse binary matrix without a full dense staging.

    The common at-scale source of binary data is a sparse matrix (user-item
    interactions — e.g. the paper's lastfm matrix is 3% dense); its dense
    f32 form is what blows the memory ceiling that bitpacking removes.
    This builder densifies only ``chunk_rows``-row slices (uint8, transient)
    on the way into the host packer, so peak extra memory is one chunk +
    the words (1/32 the dense f32 matrix), and the data crosses the
    host-device link packed.

    Stored values must be exactly 0 or 1 (explicit zeros are fine);
    anything else raises — the ``solve(packed=...)`` binaryness contract.
    """
    import scipy.sparse as sp

    if not sp.issparse(Y):
        raise TypeError(f"pack_matrix_sparse expects a scipy.sparse matrix, got {type(Y)}")
    Yr = csr_binary_canonical(Y)
    if Yr is None:
        raise ValueError(
            "pack_matrix_sparse requires exactly binary stored values"
        )
    m, n = Yr.shape

    def row_chunk(a, b):
        return np.asarray(Yr[a:b].toarray(), dtype=np.uint8)

    return pack_matrix_chunked(
        row_chunk, m, n, k,
        chunk_rows=chunk_rows, block_m=block_m, block_n=block_n,
        validate=False,  # stored values were validated above, exactly once
    )

"""GSPMD sharding of the factorization over a TPU device mesh.

The reference is a single-process NumPy library with no distributed machinery
(SURVEY.md §2.4).  The TPU-native analogue of data/model parallelism for this
workload is sharding the data matrix ``V (m, n)`` and the factors over a 2-D
``jax.sharding.Mesh``:

- ``V`` (and the masked matrices) sharded ``P(rows, cols)``,
- internal ``W (k, m)`` sharded over its ``m`` axis ``P(None, rows)``,
- ``H (k, n)`` sharded over its ``n`` axis ``P(None, cols)``,
- the rank ``k`` (small) replicated.

Under ``jit`` XLA then inserts the collectives automatically: the H-update
contraction over ``m`` becomes a ``reduce_scatter``/``all_reduce`` along the
``rows`` axis riding ICI, the W-update contraction over ``n`` the analogue
along ``cols``, and the masked observed-count normalizers are plain ``psum``s
— no host round-trips, exactly the GSPMD recipe from the scaling playbook.

These helpers only *place* arrays; the solver code is sharding-agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_solver_operands", "data_sharding", "factor_shardings"]


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("rows", "cols"),
) -> Mesh:
    """Build a 2-D mesh over ``devices`` (default: all local devices).

    If ``shape`` is omitted the device count is factored as squarely as
    possible, preferring more shards along ``rows`` (the larger data axis in
    typical tall matrices).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        shape = (n // a, a)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, mesh_axes: Tuple[str, str] = ("rows", "cols")) -> NamedSharding:
    """Sharding for the (m, n) data/mask matrices."""
    return NamedSharding(mesh, P(*mesh_axes))


def factor_shardings(
    mesh: Mesh, mesh_axes: Tuple[str, str] = ("rows", "cols"), batched: bool = False
) -> Tuple[NamedSharding, NamedSharding]:
    """Shardings for internal ``W (k, m)`` and ``H (k, n)`` (optionally with a
    leading replicated ``n_init`` axis)."""
    rows, cols = mesh_axes
    lead = (None,) if batched else ()
    w_spec = P(*lead, None, rows)
    h_spec = P(*lead, None, cols)
    return NamedSharding(mesh, w_spec), NamedSharding(mesh, h_spec)


def _divisible_axes(mesh: Mesh, mesh_axes, shape) -> Tuple[Optional[str], Optional[str]]:
    """Explicit ``device_put`` shardings require the global dimension to be
    divisible by its mesh-axis size; replicate any axis that is not (GSPMD
    still shards every intermediate it legally can)."""
    rows, cols = mesh_axes
    r = rows if shape[0] % mesh.shape[rows] == 0 else None
    c = cols if shape[1] % mesh.shape[cols] == 0 else None
    return r, c


def shard_solver_operands(Ym, Ym2, Yc, W0, H0, *, mesh: Mesh, mesh_axes=("rows", "cols")):
    """Place the solver operands on the mesh.  ``W0``/``H0`` have a leading
    ``n_init`` axis (replicated); data matrices shard over both axes."""
    rows, cols = _divisible_axes(mesh, mesh_axes, Ym.shape)
    dsh = NamedSharding(mesh, P(rows, cols))
    wsh = NamedSharding(mesh, P(None, None, rows))
    hsh = NamedSharding(mesh, P(None, None, cols))
    Ym = jax.device_put(Ym, dsh)
    # Yc may alias Ym2 (unmasked case); device_put both is harmless and keeps
    # the aliasing irrelevant downstream.
    Ym2 = jax.device_put(Ym2, dsh)
    Yc = jax.device_put(Yc, dsh)
    W0 = jax.device_put(W0, wsh)
    H0 = jax.device_put(H0, hsh)
    return Ym, Ym2, Yc, W0, H0

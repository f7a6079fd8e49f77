"""Device-mesh construction and sharding policy for the grid hierarchy.

The reference is single-device (one GPU, ``cudaSetDevice(0)`` at
MG_solver_GPU.cu:58; OpenMP threads on the host) — it has no distributed
layer at all. This module is the communication backend the TPU framework owes
instead (SURVEY.md §2 "Parallelism strategies"): a 1-D device mesh over the
grid's row axis, levels sharded row-wise while they are large enough to be
worth it, replicated below a threshold (the standard geometric-multigrid
coarse-level agglomeration strategy).

Collectives used downstream:
  * ``lax.ppermute``  — one-row halo exchange between row-neighbor devices
    (parallel.halo), riding ICI ring links;
  * ``psum``          — convergence/error reductions (replacing the
    reference's per-block partial sums + host reduction, MG_solver_GPU.cu:1266-1272);
  * implicit GSPMD collectives — resharding at restriction/prolongation
    boundaries in the compiled-program path (compiled.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"

# A level is row-sharded only while every device owns at least this many rows;
# below that the halo:compute ratio makes sharding a loss and the level is
# replicated (coarse-level agglomeration).
DEFAULT_SHARD_THRESHOLD_ROWS = 32


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = ROW_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices, named for the row axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str = ROW_AXIS) -> NamedSharding:
    """(n, n) arrays partitioned by contiguous row blocks; columns intact."""
    return NamedSharding(mesh, P(axis_name, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@dataclasses.dataclass(frozen=True)
class ShardingPolicy:
    """Decides per level whether it is row-sharded or replicated."""

    mesh: Mesh
    axis_name: str = ROW_AXIS
    threshold_rows: int = DEFAULT_SHARD_THRESHOLD_ROWS

    @property
    def n_devices(self) -> int:
        return int(np.prod(list(self.mesh.shape.values())))

    def is_sharded(self, n: int) -> bool:
        return n // self.n_devices >= self.threshold_rows and self.n_devices > 1

    def spec(self, n: int) -> P:
        return P(self.axis_name, None) if self.is_sharded(n) else P()

    def sharding(self, n: int) -> NamedSharding:
        return NamedSharding(self.mesh, self.spec(n))

    def padded_shape(self, n: int) -> tuple[int, int]:
        """Tile layout for level-n arrays under this policy: sharded levels
        pad rows so every device's block is a multiple of the 8-row sublane
        tile (the per-shard Pallas kernels' DMA alignment contract)."""
        return _policy_padded_shape(n, self.spec(n), self.mesh)


COL_AXIS = "cols"


def make_mesh_2d(shape: tuple[int, int],
                 devices: Optional[Sequence[jax.Device]] = None,
                 axis_names: tuple[str, str] = (ROW_AXIS, COL_AXIS)) -> Mesh:
    """A 2-D mesh for block partitioning (rows × cols of the grid).

    For multi-host topologies, put the DCN (inter-host) dimension on the
    row axis — row-block halos are the low-frequency traffic — and ICI
    inside; build ``devices`` with
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` in that case.
    """
    if devices is None:
        devices = jax.devices()
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


@dataclasses.dataclass(frozen=True)
class BlockShardingPolicy:
    """2-D block partition: P(rows, cols) while the level is large, falling
    back to rows-only, then replicated (coarse agglomeration) — the
    multi-host layout of SURVEY.md §2 ("block-partitioned FMG")."""

    mesh: Mesh
    row_axis: str = ROW_AXIS
    col_axis: str = COL_AXIS
    threshold_rows: int = DEFAULT_SHARD_THRESHOLD_ROWS

    def _dims(self) -> tuple[int, int]:
        return self.mesh.shape[self.row_axis], self.mesh.shape[self.col_axis]

    def spec(self, n: int) -> P:
        rows_dev, cols_dev = self._dims()
        if n // rows_dev >= self.threshold_rows:
            if cols_dev > 1 and n // cols_dev >= self.threshold_rows:
                return P(self.row_axis, self.col_axis)
            if rows_dev > 1:
                return P(self.row_axis, None)
        return P()

    def is_sharded(self, n: int) -> bool:
        return self.spec(n) != P()

    def sharding(self, n: int) -> NamedSharding:
        return NamedSharding(self.mesh, self.spec(n))

    def padded_shape(self, n: int) -> tuple[int, int]:
        """Tile layout for level-n arrays: rows ×(8·row_devices), lanes
        ×(128·col_devices) when the respective axis is sharded."""
        return _policy_padded_shape(n, self.spec(n), self.mesh)


def _policy_padded_shape(n: int, spec: P, mesh: Mesh) -> tuple[int, int]:
    """Padded tile shape for a level sharded as ``spec`` over ``mesh``:
    rows a multiple of 8·(row-axis devices), lanes a multiple of
    128·(col-axis devices) — so every shard block keeps Mosaic's (8, 128)
    tiling and the per-shard Pallas kernels need no repacking."""
    from ..ops.layout import LANE, ROW_PAD, padded_shape

    rp, cp = padded_shape(n)
    if len(spec) >= 1 and spec[0] is not None:
        # ROW_PAD (16) per device, not just the 8-row sublane tile: shard
        # blocks stay ×16 so the fused descend/ascend kernels' halved row
        # windows keep ×8 DMA alignment per shard
        q = ROW_PAD * mesh.shape[spec[0]]
        rp = -(-rp // q) * q
    if len(spec) >= 2 and spec[1] is not None:
        q = LANE * mesh.shape[spec[1]]
        cp = -(-cp // q) * q
    return rp, cp


def padded_rows(n: int, n_devices: int) -> int:
    """Rows after padding to a device-divisible count (shard_map needs equal
    blocks; the GSPMD path does not and never pads)."""
    return -(-n // n_devices) * n_devices


def pad_rows(a: jax.Array, n_devices: int) -> jax.Array:
    """Zero-pad trailing rows so axis 0 divides the device count."""
    import jax.numpy as jnp
    n = a.shape[0]
    np_ = padded_rows(n, n_devices)
    if np_ == n:
        return a
    return jnp.concatenate([a, jnp.zeros((np_ - n,) + a.shape[1:], a.dtype)], axis=0)


def unpad_rows(a: jax.Array, n: int) -> jax.Array:
    return a[:n] if a.shape[0] != n else a

"""Padded TPU-tile layout for level arrays.

Grid sizes in this framework are arbitrary (the reference's con_N rules
produce 2^k, 2^k+1, or any decrement sequence), but the TPU memory system
wants the trailing (lane) dimension in multiples of 128 and sublane offsets
in multiples of 8 — Mosaic rejects row-sliced DMAs of ragged-lane arrays
outright ("Slice shape along dimension 1 must be aligned to tiling (128)").

So the performance path stores every level as a padded (R8(n), C128(n))
array: true grid in the top-left (n, n) corner, zeros elsewhere. Padding is
applied ONCE per level per solve — all hot ops (Pallas strip smoother,
padded jnp stencils, MXU zoom) work on the padded layout directly, so no
repacking traffic ever hits the iteration path.

Invariant maintained by every padded op: cells outside the true (n, n)
corner are zero, and the true boundary ring (row/col 0 and n−1) is frozen.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SUBLANE = 8
LANE = 128
# Rows pad to ×16 (two sublane tiles), not just ×8: the fused descend kernel
# (ops.pallas_kernels) halves row windows for its in-kernel restriction, and
# the halves must stay ×8 for Mosaic's sliced DMAs.
ROW_PAD = 16


def pad_rows_to(n: int) -> int:
    return -(-n // ROW_PAD) * ROW_PAD


def pad_cols_to(n: int) -> int:
    return -(-n // LANE) * LANE


def padded_shape(n: int) -> tuple[int, int]:
    return pad_rows_to(n), pad_cols_to(n)


@partial(jax.jit, static_argnames=())
def pad_grid(a: jnp.ndarray) -> jnp.ndarray:
    """(n, n) → (R8(n), C128(n)) with zero fill."""
    n = a.shape[0]
    rp, cp = padded_shape(n)
    if (rp, cp) == a.shape:
        return a
    return jnp.zeros((rp, cp), a.dtype).at[:n, :n].set(a)


def pad_grid_to(a: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """(n, n) → ``shape`` with zero fill (policy-padded layouts: sharded
    levels round rows/lanes up to per-device tile multiples)."""
    if tuple(a.shape) == tuple(shape):
        return a
    return jnp.zeros(shape, a.dtype).at[:a.shape[0], :a.shape[1]].set(a)


def unpad_grid(a: jnp.ndarray, n: int) -> jnp.ndarray:
    return a[:n, :n]


def interior_mask(n: int, shape: tuple[int, int], dtype=jnp.bool_) -> jnp.ndarray:
    """True on PDE-interior cells (1..n−2 both dims) of a padded array."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    m = (r >= 1) & (r <= n - 2) & (c >= 1) & (c <= n - 2)
    return m if dtype == jnp.bool_ else m.astype(dtype)


def valid_mask(n: int, shape: tuple[int, int], dtype=jnp.bool_) -> jnp.ndarray:
    """True on true-grid cells (0..n−1 both dims) of a padded array."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    m = (r <= n - 1) & (c <= n - 1)
    return m if dtype == jnp.bool_ else m.astype(dtype)

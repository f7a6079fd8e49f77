"""Padded-layout 3-D transfer operators: the XLA glue of the 3-D hot path.

The brick-streamed Pallas kernels (ops.pallas3d) work on the padded
(nz, rp, cp) layout (z unpadded, rows ×16, lanes ×128). A V-cycle that
pads/unpads around every kernel call pays ~3 extra full-volume copies per
smoothing pass, and the plain-jnp transfer ops (models.poisson3d.restrict3 /
prolong3) lower to strided lane scatters and moveaxis transposes — both
probed 10×-class slow on TPU in 2-D. This module keeps the whole cycle
resident in the padded layout:

- ``restrict3_p``: 2:1 full-weighting ([¼,½,¼]³ then even sample) fine →
  coarse, zero boundary — the 3-D member of the restriction family
  (reference 2-D analog: doRestriction, MG_solver_CPU.cpp:640-680).
- ``prolong3_add_p``: fine += trilinear(coarse) in one fused XLA program
  (reference 2-D analog: doProlongation + addition, MG_solver_CPU.cpp:682-724
  and the GPU zoom+add pair at MG_solver_GPU.cu:1364-1423).

Lowering rules (probed on hardware in 2-D, ROADMAP §1): lane/sublane
resampling is a ``jnp.take`` gather — every reformulation (strided slice,
reshape-index, scatter-dilate, …) measured slower; leading-dim (z) strided
slices are plane-contiguous and cheap. The 2:1 trilinear gather uses the
identity e[i] = ½·(c[⌊i/2⌋] + c[⌈i/2⌉]) — exact for even i too — so each
axis is two takes + one add.

Padding invariant: rows/cols ≥ n are zero on the way in and stay zero on
the way out (restriction masks them; prolongation gathers only zeros into
them), so no separate re-masking pass is ever needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .layout import pad_cols_to, pad_rows_to


def _fw_axis_take(a, n_src: int, m: int, p_dst: int, axis: int):
    """[¼,½,¼]-weighted 2:1 restriction along a sublane/lane ``axis`` via
    three clipped take-gathers; output entries ≥ m (coarse padding and the
    zero-Dirichlet faces) are forced to 0."""
    idx = jnp.arange(p_dst)
    mid = jnp.clip(2 * idx, 0, n_src - 1)
    lo = jnp.clip(2 * idx - 1, 0, n_src - 1)
    hi = jnp.clip(2 * idx + 1, 0, n_src - 1)
    out = (0.25 * jnp.take(a, lo, axis=axis)
           + 0.5 * jnp.take(a, mid, axis=axis)
           + 0.25 * jnp.take(a, hi, axis=axis))
    interior = (idx >= 1) & (idx <= m - 2)
    shape = [1, 1, 1]
    shape[axis] = p_dst
    return jnp.where(interior.reshape(shape), out, jnp.zeros_like(out))


@partial(jax.jit, static_argnames=("n", "m"))
def restrict3_p(d, n: int, m: int):
    """Padded (n, rp_n, cp_n) → padded (m, rp_m, cp_m) 2:1 full-weighting
    restriction with zero boundary; requires n == 2m − 1."""
    if n != 2 * m - 1:
        raise ValueError(f"need n == 2m-1, got {n} -> {m}")
    # z (leading, untiled): plane-contiguous strided slices; interior z of
    # the coarse volume is 1..m-2 ← fine planes (2z−1, 2z, 2z+1)
    zc = (0.25 * d[1:n - 2:2] + 0.5 * d[2:n - 1:2] + 0.25 * d[3:n:2])
    zero = jnp.zeros_like(zc[:1])
    out = jnp.concatenate([zero, zc, zero], axis=0)          # (m, rp_n, cp_n)
    out = _fw_axis_take(out, n, m, pad_rows_to(m), axis=1)   # (m, rp_m, cp_n)
    out = _fw_axis_take(out, n, m, pad_cols_to(m), axis=2)   # (m, rp_m, cp_m)
    return out


def _lerp_axis_take(c, m: int, p_dst: int, axis: int):
    """2:1 trilinear expansion along ``axis``: e[i] = ½(c[⌊i/2⌋] + c[⌈i/2⌉]).

    Indices are clipped to the coarse extent; gathered padding is zero by
    the layout invariant, so fine padding comes out zero with no masking."""
    idx = jnp.arange(p_dst)
    lo = jnp.clip(idx // 2, 0, m - 1)
    hi = jnp.clip((idx + 1) // 2, 0, m - 1)
    return 0.5 * (jnp.take(c, lo, axis=axis) + jnp.take(c, hi, axis=axis))


@partial(jax.jit, static_argnames=("n", "m"))
def prolong3_add_p(u, c, n: int, m: int):
    """u += trilinear(c): padded coarse (m, rp_m, cp_m) correction expanded
    onto the padded fine (n, rp_n, cp_n) iterate, one fused XLA program;
    requires n == 2m − 1. Dirichlet faces stay intact because the coarse
    correction is zero on its own faces."""
    if n != 2 * m - 1:
        raise ValueError(f"need n == 2m-1, got {m} -> {n}")
    e = _lerp_axis_take(c, m, n, axis=0)
    e = _lerp_axis_take(e, m, pad_rows_to(n), axis=1)
    e = _lerp_axis_take(e, m, pad_cols_to(n), axis=2)
    return u + e

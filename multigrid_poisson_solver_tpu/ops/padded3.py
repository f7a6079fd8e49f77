"""Padded-layout 3-D transfer operators: the XLA glue of the 3-D hot path.

The brick-streamed Pallas kernels (ops.pallas3d) work on the padded
(nz, rp, cp) layout (z unpadded, rows ×16, lanes ×128). A V-cycle that
pads/unpads around every kernel call pays ~3 extra full-volume copies per
smoothing pass, and the plain-jnp transfer ops (models.poisson3d.restrict3 /
prolong3) lower to strided lane scatters and moveaxis transposes — both
probed 10×-class slow on TPU in 2-D (the 513³ hardware profile measured
restrict3 alone at 310 ms). This module keeps the whole cycle resident in
the padded layout:

- ``restrict3_p``: 2:1 restriction fine → coarse, zero boundary, in
  "full_weighting" ([¼,½,¼]³) or "sampling" (reference doRestriction
  semantics, MG_solver_CPU.cpp:640-680) mode.
- ``prolong3_add_p``: fine += trilinear(coarse) in one fused XLA program
  (reference 2-D analog: doProlongation + addition, MG_solver_CPU.cpp:682-724
  and the GPU zoom+add pair at MG_solver_GPU.cu:1364-1423).

Lowering (hardware A/B at 513³, session of 2026-08-17, ms):

| op                | strided jnp | zr-gather | matmul HIGHEST | matmul HIGH |
| restrict 513→257  |   310       |   10.3    |   **6.7**      |  2.9–3.2    |
| prolong+add 257→513|   24*      |   17.6    |   **10.6**     |  6.9        |

(*original moveaxis/scatter form.) The separable resampling runs as three
einsum contractions on the MXU with ``precision=HIGHEST`` (bf16_6x — exact
to fp32 roundoff, measured 6e-8 rel; HIGH/bf16_3x leaves 8e-6-rel noise
because two bf16 words cannot carry an fp32 input, so it is offered as an
opt-in ``precision`` argument only). Weight matrices are built on device
from iota comparisons at trace time — ~2 MB of host constants per level
would otherwise ride the ~2 MB/s remote-compile tunnel. "sampling" mode
restriction keeps a 1-tap flat row-gather (a leading-dim gather of the
(nz·rp, cp) reshape — 0.90 ms where the same gather as a 3-D middle-axis
take costs 8.9 ms) plus one lane take: cheaper than any matmul.

Padding invariant: rows/cols ≥ n are zero on the way in and stay zero on
the way out (the weight rows/gather masks for padding targets are zero),
so no separate re-masking pass is ever needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .layout import pad_cols_to, pad_rows_to

_HIGHEST = jax.lax.Precision.HIGHEST


def _iotas(rows: int, cols: int):
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return i, j


def _restrict_w(p_dst: int, m: int, p_src: int, taps, dtype):
    """(p_dst, p_src) 1-D restriction matrix: dst i ← Σ w·src[2i+off] on the
    coarse interior; boundary and padding rows are all-zero (the mask is
    baked into the operator)."""
    i, j = _iotas(p_dst, p_src)
    interior = (i >= 1) & (i <= m - 2)
    w = jnp.zeros((p_dst, p_src), dtype)
    for off, wt in taps:
        w = w + jnp.where(interior & (j == 2 * i + off),
                          jnp.asarray(wt, dtype), jnp.zeros((), dtype))
    return w


def _prolong_w(p_dst: int, n: int, p_src: int, m: int, dtype):
    """(p_dst, p_src) 1-D 2:1 linear-interpolation matrix built on the
    e[i] = ½·(c[⌊i/2⌋] + c[⌈i/2⌉]) identity (the two taps coincide at even
    i and sum to 1). Rows ≥ n (fine padding) are all-zero."""
    i, j = _iotas(p_dst, p_src)
    valid = i <= n - 1
    half = jnp.asarray(0.5, dtype)
    zero = jnp.zeros((), dtype)
    return (jnp.where(valid & (j == i // 2), half, zero)
            + jnp.where(valid & (j == (i + 1) // 2), half, zero))


def _zr_gather(a, taps, out_z: int, out_r: int):
    """Weighted sum of flat leading-dim gathers: one (z, row) resampling
    pass. ``taps`` is a list of (zmap (out_z,), rmap (out_r,), weight)."""
    nz, rp, cp = a.shape
    flat = a.reshape(nz * rp, cp)
    acc = None
    for zmap, rmap, w in taps:
        idx = (zmap[:, None] * rp + rmap[None, :]).reshape(-1)
        g = jnp.take(flat, idx, axis=0)
        acc = w * g if acc is None else acc + w * g
    return acc.reshape(out_z, out_r, cp)


@partial(jax.jit, static_argnames=("n", "m", "mode", "precision", "zp_out"))
def restrict3_p(d, n: int, m: int, mode: str = "full_weighting",
                precision=_HIGHEST, zp_out: int | None = None):
    """Padded (zp_in, rp_n, cp_n) → padded (zp_out, rp_m, cp_m) 2:1
    restriction with zero boundary; requires n == 2m − 1. ``mode`` picks the
    stencil: "full_weighting" ([¼,½,¼]³ — REQUIRED for rb-GS smoothing) or
    "sampling" (even points, the reference's doRestriction semantics).

    The z depths may carry zero padding beyond the grid (z-sharded layouts,
    parallel.pallas_shard3): zp_in = d.shape[0] ≥ n, and ``zp_out`` ≥ m
    (default m) sizes the output depth — the weight rows for padded planes
    are all-zero, so padding stays zero with no re-masking."""
    if n != 2 * m - 1:
        raise ValueError(f"need n == 2m-1, got {n} -> {m}")
    zp_in, rp_n, cp_n = d.shape
    assert zp_in >= n, (d.shape, n)
    zp_out = m if zp_out is None else zp_out
    rp_m, cp_m = pad_rows_to(m), pad_cols_to(m)

    if mode == "sampling":
        # 1-tap gather in (z, row), one lane take, then the interior mask
        idx_z = jnp.clip(2 * jnp.arange(zp_out), 0, n - 1)
        idx_r = jnp.clip(2 * jnp.arange(rp_m), 0, n - 1)
        out = _zr_gather(d, [(idx_z, idx_r, 1.0)], zp_out, rp_m)
        idx_c = jnp.clip(2 * jnp.arange(cp_m), 0, n - 1)
        out = jnp.take(out.reshape(zp_out * rp_m, cp_n), idx_c,
                       axis=1).reshape(zp_out, rp_m, cp_m)
        z = jnp.arange(zp_out).reshape(zp_out, 1, 1)
        r = jnp.arange(rp_m).reshape(1, rp_m, 1)
        c = jnp.arange(cp_m).reshape(1, 1, cp_m)
        interior = ((z >= 1) & (z <= m - 2) & (r >= 1) & (r <= m - 2)
                    & (c >= 1) & (c <= m - 2))
        return jnp.where(interior, out, jnp.zeros_like(out))
    if mode != "full_weighting":
        raise ValueError(f"unknown restriction mode {mode!r}")

    taps = [(-1, 0.25), (0, 0.5), (1, 0.25)]
    wz = _restrict_w(zp_out, m, zp_in, taps, d.dtype)
    wr = _restrict_w(rp_m, m, rp_n, taps, d.dtype)
    wc = _restrict_w(cp_m, m, cp_n, taps, d.dtype)
    x = jnp.einsum('zs,src->zrc', wz, d, precision=precision)
    x = jnp.einsum('rs,zsc->zrc', wr, x, precision=precision)
    return jnp.einsum('cs,zrs->zrc', wc, x, precision=precision)


@partial(jax.jit, static_argnames=("n", "m"))
def restrict3_lanes_p(dwide, n: int, m: int):
    """Finish the fused descend leg: even-lane decimation of the kernel's
    (m, rp_n//2, cp_n) ``dwide`` output (already z/row-restricted and, in
    full-weighting mode, lane-smoothed) onto the coarse padded layout
    (m, rp_m, cp_m). One 1-tap take on a quarter volume — the only lane
    work Mosaic can't do in-kernel (no lane de-interleave)."""
    mz, rph, cpf = dwide.shape
    # mz > m: z-sharded dwide with frozen zero padding planes (the kernel's
    # coarse gates already zeroed planes >= m) — depth passes through
    assert mz >= m and n == 2 * m - 1, (dwide.shape, n, m)
    rp_m, cp_m = pad_rows_to(m), pad_cols_to(m)
    idx_c = jnp.clip(2 * jnp.arange(cp_m), 0, cpf - 1)
    out = jnp.take(dwide.reshape(mz * rph, cpf), idx_c,
                   axis=1).reshape(mz, rph, cp_m)
    cc = jnp.arange(cp_m).reshape(1, 1, cp_m)
    out = jnp.where((cc >= 1) & (cc <= m - 2), out, jnp.zeros_like(out))
    if rph < rp_m:
        out = jnp.pad(out, ((0, 0), (0, rp_m - rph), (0, 0)))
    return out[:, :rp_m]


@partial(jax.jit, static_argnames=("n", "m", "precision"))
def prolong3_lanes_p(c, n: int, m: int, precision=_HIGHEST):
    """Start the fused ascend leg: lane-expand the padded coarse correction
    (m, rp_m, cp_m) to FINE lanes → (m, rp_n//2 + 8, cp_n), the ``cwide``
    input of ops.pallas3d.fused_ascend3_padded. One 2-tap einsum on the
    coarse (quarter) volume — the only lane work Mosaic can't do in-kernel
    (no lane interleave). Row count is the kernel's coarse-window bound
    rp_n//2 + 8 (≥ rp_m − 8; padded rows are zero)."""
    rp_m, cp_m = c.shape[1], c.shape[2]
    cp_n = pad_cols_to(n)
    rows_out = pad_rows_to(n) // 2 + 8
    wc = _prolong_w(cp_n, n, cp_m, m, c.dtype)
    e = jnp.einsum('cs,zrs->zrc', wc, c, precision=precision)
    if rows_out > rp_m:
        e = jnp.pad(e, ((0, 0), (0, rows_out - rp_m), (0, 0)))
    return e[:, :rows_out]


@partial(jax.jit, static_argnames=("n", "m", "interior_only", "precision"))
def prolong3_add_p(u, c, n: int, m: int, interior_only: bool = False,
                   precision=_HIGHEST):
    """u += trilinear(c): padded coarse (m, rp_m, cp_m) correction expanded
    onto the padded fine (n, rp_n, cp_n) iterate, one fused XLA program;
    requires n == 2m − 1. In the correction scheme the coarse faces are
    zero, so the fine Dirichlet faces stay intact; ``interior_only=True``
    masks the expanded correction to the fine interior anyway (the schedule
    engines' _prolong_add3 semantics — needed when the coarse level carries
    a full FMG solution with nonzero boundary)."""
    if n != 2 * m - 1:
        raise ValueError(f"need n == 2m-1, got {m} -> {n}")
    zp_c, rp_m, cp_m = c.shape
    zp_f, rp_n, cp_n = u.shape
    assert zp_c >= m and zp_f >= n, (c.shape, u.shape, n, m)
    assert (rp_n, cp_n) == (pad_rows_to(n), pad_cols_to(n)), (u.shape, n)

    wc = _prolong_w(cp_n, n, cp_m, m, c.dtype)
    wr = _prolong_w(rp_n, n, rp_m, m, c.dtype)
    wz = _prolong_w(zp_f, n, zp_c, m, c.dtype)
    # ascending size order: lanes on the coarse volume first, z last
    e = jnp.einsum('cs,zrs->zrc', wc, c, precision=precision)
    e = jnp.einsum('rs,zsc->zrc', wr, e, precision=precision)
    e = jnp.einsum('zs,src->zrc', wz, e, precision=precision)

    if interior_only:
        z = jnp.arange(zp_f).reshape(zp_f, 1, 1)
        r = jnp.arange(rp_n).reshape(1, rp_n, 1)
        cc = jnp.arange(cp_n).reshape(1, 1, cp_n)
        mask = ((z >= 1) & (z <= n - 2) & (r >= 1) & (r <= n - 2)
                & (cc >= 1) & (cc <= n - 2))
        e = jnp.where(mask, e, jnp.zeros_like(e))
    return u + e

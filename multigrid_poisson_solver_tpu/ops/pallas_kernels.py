"""Pallas TPU kernels for the bandwidth-bound hot path.

The reference's CUDA kernels (ker_Smoothing_GPU and friends,
MG_solver_GPU.cu:502-958) are one-thread-per-point grid-stride loops that
re-read U and F from device memory every sweep. The TPU-native replacement
restructures the computation around the memory hierarchy instead:

  * ``fused_jacobi_padded``: k Jacobi sweeps in ONE pass over HBM. The grid
    is cut into full-width row strips; each strip is DMA'd into VMEM once
    with an 8-row halo (trapezoidal/overlapped tiling), k ≤ 8 sweeps run
    on-chip ping-ponging two VMEM buffers (the TPU form of the reference's
    U/U0 ping-pong, MG_solver_GPU.cu:584-661), and only the strip's owned
    rows are written back. HBM traffic drops from 12 bytes/point/sweep to
    ~(12 + halo overhead)/k — fusion XLA cannot do across sweeps because
    each sweep is a full data-dependency barrier.
  * Strip loads are double-buffered: strip i+1's DMA issues before strip i's
    compute begins, hiding DMA latency under sweep arithmetic. Result strips
    DMA straight from the compute buffer; the only sync is a cheap
    wait-before-slot-reuse two strips later.
  * The per-sweep inner loop is pure fp32 vector arithmetic: the freeze mask
    (cut edges + Dirichlet boundary + padding) and the ω/4·h²·f source term
    are folded into two per-strip coefficient buffers A and C built once per
    strip, so a sweep is 4 rolls + a handful of FMAs —
    u' = u + A·(Σnb − 4u) − C, with A = mask·ω/4 and C = A·h²·f.
    (Rebuilding int32 iota masks every sweep measurably halved throughput.)
  * Everything operates on the padded tile layout (ops.layout): row offsets
    are multiples of 8 and the lane dimension a multiple of 128 — Mosaic
    hard-requires both for sliced DMAs, and its alignment prover needs
    explicit pl.multiple_of hints to see through clip/mul arithmetic.

Trapezoid correctness: a strip owning rows [r0, r0+R) loads [r0−8, r0−8+S),
S = R + 16. After sweep s, rows within (k−s) of a *cut* edge are stale; rows
adjacent to the true Dirichlet boundary are anchored by it (boundary rows are
never updated and always correct). Owned rows sit ≥ 8 ≥ k rows from any cut
edge, so after k ≤ 8 sweeps every owned row is exact.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import SUBLANE, padded_shape

HALO = 8                      # rows of halo per cut edge; also max fused sweeps
MAX_FUSED_SWEEPS = HALO

# VMEM budget for strip buffers (headroom under ~16 MB/core).
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024
# Resident buffers: 2 u-load slots, 2 f-load slots (reused as the C
# coefficient), 1 ping-pong work buffer, 1 A coefficient.
_NUM_BUFFERS = 6


def _strip_rows(cp: int, itemsize: int) -> int:
    s = _VMEM_BUDGET_BYTES // (_NUM_BUFFERS * cp * itemsize)
    s = (s // SUBLANE) * SUBLANE
    return max(4 * HALO, min(s, 1024))


def _mul8(x):
    return pl.multiple_of(x, SUBLANE)


def _i32(v):
    """Kernel index math must stay int32: under jax_enable_x64 python ints
    promote everything to int64, and Mosaic's int64 lowering recurses once
    per op — a strip pipeline overflows the Python stack (RecursionError)."""
    return jnp.asarray(v, jnp.int32)


def _fused_jacobi_kernel(u_hbm, f_hbm, out_hbm,
                         u_slots, fc_slots, work, a_buf,
                         load_sems, out_sems,
                         *, n: int, rp: int, cp: int, steps: int,
                         num_strips: int, strip: int, owned: int,
                         h2: float, omega: float, from_zero: bool):
    def load_start(i):
        # owned, HALO, rp, strip are all multiples of 8, so the clip result
        # is too — but Mosaic's alignment prover can't see through clip/mul,
        # hence the explicit hints.
        return _mul8(jnp.clip(_i32(i) * _i32(owned) - _i32(HALO),
                              _i32(0), _i32(rp - strip)))

    def write_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned), _i32(0), _i32(rp - owned)))

    def load_copies(i, slot):
        # from_zero: the initial iterate is identically zero (correction
        # levels), so sweep 1 is closed-form and u is never read — only f
        # streams in, a 33% HBM-traffic cut for the pre-smoothing leg
        s = load_start(i)
        copies = (pltpu.make_async_copy(f_hbm.at[pl.ds(s, strip), :],
                                        fc_slots.at[slot],
                                        load_sems.at[slot, _i32(1)]),)
        if not from_zero:
            copies += (pltpu.make_async_copy(
                u_hbm.at[pl.ds(s, strip), :], u_slots.at[slot],
                load_sems.at[slot, _i32(0)]),)
        return copies

    def out_copy(i, slot):
        wstart = write_start(i)
        wlo = _mul8(wstart - load_start(i))
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wlo, owned), :],
            out_hbm.at[pl.ds(wstart, owned), :],
            out_sems.at[slot])

    for cp_ in load_copies(_i32(0), _i32(0)):
        cp_.start()

    def body(i, _):
        slot = jax.lax.rem(_i32(i), _i32(2))
        nxt = jax.lax.rem(_i32(i) + _i32(1), _i32(2))

        @pl.when(i + 1 < num_strips)
        def _():
            # slot `nxt` was written out at strip i−1; its result DMA must
            # drain before the prefetch overwrites the buffer
            @pl.when(i >= 1)
            def _():
                out_copy(i - 1, nxt).wait()
            for cp_ in load_copies(i + 1, nxt):
                cp_.start()

        for cp_ in load_copies(i, slot):
            cp_.wait()

        start_c = load_start(i)

        # --- per-strip coefficients (amortized over the sweeps) -------------
        rows = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 1)
        g = rows + start_c
        ok_global = ((g >= 1) & (g <= n - 2)         # Dirichlet + pad rows
                     & (cols >= 1) & (cols <= n - 2))  # Dirichlet + pad cols
        ok = ok_global & (rows >= 1) & (rows <= strip - 2)  # cut edges frozen
        a = jnp.where(ok, jnp.float32(0.25 * omega), jnp.float32(0.0)
                      ).astype(u_hbm.dtype)
        a_buf[:] = a
        raw_f = fc_slots[slot]              # read before the C overwrite
        fc_slots[slot] = a * (jnp.asarray(h2, u_hbm.dtype) * raw_f)

        if from_zero:
            # closed-form sweep 1 from u≡0: u₁ = −(ω/4)·h²·f on the global
            # interior (exact everywhere, including the strip edges — no
            # neighbor dependence — so the trapezoid only needs steps−1
            # halo rows, which HALO ≥ steps covers)
            u_slots[slot] = jnp.where(
                ok_global,
                -(jnp.float32(0.25 * omega)
                  * (jnp.asarray(h2, u_hbm.dtype) * raw_f)),
                jnp.zeros((strip, cp), u_hbm.dtype))

        # --- k sweeps, pure fp32 vector arithmetic --------------------------
        def sweep(src, dst):
            u = src[:]
            nb = (pltpu.roll(u, shift=_i32(1), axis=0)
                  + pltpu.roll(u, shift=_i32(strip - 1), axis=0)
                  + pltpu.roll(u, shift=_i32(1), axis=1)
                  + pltpu.roll(u, shift=_i32(cp - 1), axis=1))
            dst[:] = u + a_buf[:] * (nb - 4.0 * u) - fc_slots[slot][:]

        n_sweeps = steps - 1 if from_zero else steps
        bufs = [u_slots.at[slot], work]
        for s in range(n_sweeps):
            sweep(bufs[s % 2], bufs[(s + 1) % 2])
        if n_sweeps % 2 == 1:
            # result must sit in the slot buffer for the direct out-DMA
            u_slots[slot] = work[:]

        out_copy(i, slot).start()
        return _i32(0)

    jax.lax.fori_loop(_i32(0), _i32(num_strips), body, _i32(0), unroll=False)

    # drain the last (up to) two outstanding writes
    last = num_strips - 1     # static python ints: no traced math needed

    if num_strips >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()

    out_copy(_i32(last), _i32(last % 2)).wait()


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "from_zero",
                                   "interpret"))
def _fused_jacobi_call(u, f, n: int, h: float, steps: int, omega: float,
                       from_zero: bool, interpret: bool):
    rp, cp = u.shape
    assert (rp, cp) == padded_shape(n), (
        f"expected padded layout {padded_shape(n)} for n={n}, got {u.shape}")
    itemsize = jnp.dtype(u.dtype).itemsize

    strip = min(_strip_rows(cp, itemsize), rp)
    if strip >= rp:
        strip, owned, num_strips = rp, rp, 1
    else:
        owned = strip - 2 * HALO
        num_strips = math.ceil(rp / owned)

    kernel = partial(_fused_jacobi_kernel, n=n, rp=rp, cp=cp, steps=steps,
                     num_strips=num_strips, strip=strip, owned=owned,
                     h2=h * h, omega=omega, from_zero=from_zero)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, cp), u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, strip, cp), u.dtype),   # u load slots
            pltpu.VMEM((2, strip, cp), u.dtype),   # f load slots -> C coeff
            pltpu.VMEM((strip, cp), u.dtype),      # ping-pong work buffer
            pltpu.VMEM((strip, cp), u.dtype),      # A coefficient (mask·ω/4)
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET_BYTES),
        interpret=interpret,
    )(u, f)


def _residual_kernel(u_hbm, f_hbm, out_hbm,
                     u_slots, f_slots, out_slots,
                     load_sems, out_sems,
                     *, n: int, rp: int, cp: int, num_strips: int,
                     strip: int, owned: int, inv_h2: float, negate: bool):
    """Strip-pipelined 5-point residual: r = (Σnb − 4u)/h² − f on the
    interior, 0 elsewhere; optionally negated (the restriction source).

    Single pass over HBM (read u, f; write r) — XLA's roll-based residual
    materializes four shifted copies (~44 B/point observed); this is 12.
    """

    def load_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned) - _i32(HALO),
                              _i32(0), _i32(rp - strip)))

    def write_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned), _i32(0), _i32(rp - owned)))

    def load_copies(i, slot):
        s = load_start(i)
        return (pltpu.make_async_copy(u_hbm.at[pl.ds(s, strip), :],
                                      u_slots.at[slot], load_sems.at[slot, _i32(0)]),
                pltpu.make_async_copy(f_hbm.at[pl.ds(s, strip), :],
                                      f_slots.at[slot], load_sems.at[slot, _i32(1)]))

    def out_copy(i, slot):
        # source: the owned window of the full-strip staging buffer —
        # Mosaic can't lower dynamic_slice on VALUES, but pl.ds sub-slicing
        # of a REF as a DMA source is fine (same pattern as the smoother)
        wstart = write_start(i)
        wlo = pl.multiple_of(wstart - load_start(i), SUBLANE)
        return pltpu.make_async_copy(
            out_slots.at[slot, pl.ds(wlo, owned), :],
            out_hbm.at[pl.ds(wstart, owned), :],
            out_sems.at[slot])

    for cp_ in load_copies(_i32(0), _i32(0)):
        cp_.start()

    def body(i, _):
        slot = jax.lax.rem(_i32(i), _i32(2))
        nxt = jax.lax.rem(_i32(i) + _i32(1), _i32(2))

        @pl.when(i + 1 < num_strips)
        def _():
            @pl.when(i >= 1)
            def _():
                out_copy(i - 1, nxt).wait()
            for cp_ in load_copies(i + 1, nxt):
                cp_.start()

        for cp_ in load_copies(i, slot):
            cp_.wait()

        start_c = load_start(i)
        u = u_slots[slot]
        nb = (pltpu.roll(u, shift=_i32(1), axis=0)
              + pltpu.roll(u, shift=_i32(strip - 1), axis=0)
              + pltpu.roll(u, shift=_i32(1), axis=1)
              + pltpu.roll(u, shift=_i32(cp - 1), axis=1))
        r = (nb - 4.0 * u) * inv_h2 - f_slots[slot]
        if negate:
            r = -r

        rows = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 1)
        g = rows + start_c
        ok = ((g >= 1) & (g <= n - 2) & (cols >= 1) & (cols <= n - 2))
        out_slots[slot] = jnp.where(ok, r, jnp.zeros_like(r))
        out_copy(i, slot).start()
        return _i32(0)

    jax.lax.fori_loop(_i32(0), _i32(num_strips), body, _i32(0), unroll=False)

    last = num_strips - 1     # static python ints: no traced math needed

    if num_strips >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()

    out_copy(_i32(last), _i32(last % 2)).wait()


@partial(jax.jit, static_argnames=("n", "h", "negate", "interpret"))
def residual_pallas(u, f, n: int, h: float, negate: bool = False,
                    interpret: bool = False):
    """Pallas 5-point residual on the padded layout; matches
    ops.padded.residual_p (getResidual, MG_solver_CPU.cpp:554-564)."""
    rp, cp = u.shape
    assert (rp, cp) == padded_shape(n), (
        f"expected padded layout {padded_shape(n)} for n={n}, got {u.shape}")
    itemsize = jnp.dtype(u.dtype).itemsize

    strip = min(_strip_rows(cp, itemsize), rp)
    if strip >= rp:
        strip, owned, num_strips = rp, rp, 1
    else:
        owned = strip - 2 * HALO
        num_strips = math.ceil(rp / owned)

    kernel = partial(_residual_kernel, n=n, rp=rp, cp=cp,
                     num_strips=num_strips, strip=strip, owned=owned,
                     inv_h2=1.0 / (h * h), negate=negate)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, cp), u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, strip, cp), u.dtype),
            pltpu.VMEM((2, strip, cp), u.dtype),
            pltpu.VMEM((2, strip, cp), u.dtype),   # full-strip out staging
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET_BYTES),
        interpret=interpret,
    )(u, f)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _residual_mw_kernel(*args, n: int, rp: int, cp: int, num_strips: int,
                        strip: int, owned: int, inv_h2: float, nwords: int):
    """Strip-pipelined compensated residual of a multi-word fp32 state.

    Replicates refine.residual_tw_p / residual_df_p's arithmetic — dd-EFT
    stencil chains per significant word — in ONE pass over HBM. The XLA
    forms materialize every roll of every word (~16 ms at 8193² for three
    words); this streams nwords+1 arrays once (~2 ms).
    """
    w_hbm = args[:nwords]
    f_hbm = args[nwords]
    out_hbm = args[nwords + 1]
    w_slots = args[nwords + 2]          # (nwords, 2, strip, cp)
    f_slots = args[nwords + 3]          # (2, strip, cp)
    out_slots = args[nwords + 4]        # (2, strip, cp)
    load_sems = args[nwords + 5]        # (2, nwords + 1)
    out_sems = args[nwords + 6]         # (2,)

    def load_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned) - _i32(HALO),
                              _i32(0), _i32(rp - strip)))

    def write_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned), _i32(0), _i32(rp - owned)))

    def load_copies(i, slot):
        s = load_start(i)
        copies = tuple(
            pltpu.make_async_copy(w_hbm[w].at[pl.ds(s, strip), :],
                                  w_slots.at[_i32(w), slot],
                                  load_sems.at[slot, _i32(w)])
            for w in range(nwords))
        copies += (pltpu.make_async_copy(f_hbm.at[pl.ds(s, strip), :],
                                         f_slots.at[slot],
                                         load_sems.at[slot, _i32(nwords)]),)
        return copies

    def out_copy(i, slot):
        wstart = write_start(i)
        wlo = _mul8(wstart - load_start(i))
        return pltpu.make_async_copy(
            out_slots.at[slot, pl.ds(wlo, owned), :],
            out_hbm.at[pl.ds(wstart, owned), :],
            out_sems.at[slot])

    for cp_ in load_copies(_i32(0), _i32(0)):
        cp_.start()

    def dd_chain(u):
        """(hi, lo, lo2): doubly-compensated 5-term stencil sum (matches
        refine._eft_stencil_sum_dd, rolls instead of jnp.roll)."""
        un = pltpu.roll(u, shift=_i32(1), axis=0)
        us = pltpu.roll(u, shift=_i32(strip - 1), axis=0)
        uw = pltpu.roll(u, shift=_i32(1), axis=1)
        ue = pltpu.roll(u, shift=_i32(cp - 1), axis=1)
        hi, lo = _two_sum(un, us)
        lo2 = jnp.zeros_like(hi)
        for term in (uw, ue, -u, -u, -u, -u):
            hi, e = _two_sum(hi, term)
            lo, e2 = _two_sum(lo, e)
            lo2 = lo2 + e2
        hi, e = _two_sum(hi, lo)
        lo, e2 = _two_sum(e, lo2)
        return hi, lo, e2

    def body(i, _):
        slot = jax.lax.rem(_i32(i), _i32(2))
        nxt = jax.lax.rem(_i32(i) + _i32(1), _i32(2))

        @pl.when(i + 1 < num_strips)
        def _():
            @pl.when(i >= 1)
            def _():
                out_copy(i - 1, nxt).wait()
            for cp_ in load_copies(i + 1, nxt):
                cp_.start()

        for cp_ in load_copies(i, slot):
            cp_.wait()

        start_c = load_start(i)
        f = f_slots[slot]
        c = jnp.asarray(inv_h2, f.dtype)

        hi0, lo0, m0 = dd_chain(w_slots[_i32(0), slot])
        if nwords >= 2:
            hi1, lo1, m1 = dd_chain(w_slots[_i32(1), slot])
        else:
            hi1 = lo1 = m1 = jnp.zeros_like(hi0)
        if nwords == 3:
            u2 = w_slots[_i32(2), slot]
            s2 = (pltpu.roll(u2, shift=_i32(1), axis=0)
                  + pltpu.roll(u2, shift=_i32(strip - 1), axis=0)
                  + pltpu.roll(u2, shift=_i32(1), axis=1)
                  + pltpu.roll(u2, shift=_i32(cp - 1), axis=1) - 4.0 * u2)
        else:
            s2 = jnp.zeros_like(hi0)

        # combination identical to refine.residual_tw_p
        r_big = hi0 * c - f
        t, tc = _two_sum(lo0, hi1)
        t2 = ((lo1 + m0) + (m1 + s2)) + tc
        r = (r_big + t * c) + t2 * c

        rows = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 1)
        g = rows + start_c
        ok = ((g >= 1) & (g <= n - 2) & (cols >= 1) & (cols <= n - 2))
        out_slots[slot] = jnp.where(ok, r, jnp.zeros_like(r))
        out_copy(i, slot).start()
        return _i32(0)

    jax.lax.fori_loop(_i32(0), _i32(num_strips), body, _i32(0), unroll=False)

    last = num_strips - 1
    if num_strips >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()
    out_copy(_i32(last), _i32(last % 2)).wait()


@partial(jax.jit, static_argnames=("n", "h", "interpret"))
def residual_tw_pallas(u0, u1, u2, f, n: int, h: float,
                       interpret: bool = False):
    """Pallas compensated residual of the triple-word state (padded layout);
    matches refine.residual_tw_p bit-for-bit in op order."""
    return _residual_mw_call((u0, u1, u2), f, n, h, interpret)


@partial(jax.jit, static_argnames=("n", "h", "interpret"))
def residual_df_pallas(u0, u1, f, n: int, h: float, interpret: bool = False):
    """Pallas compensated residual of the double-word state. Slightly MORE
    accurate than refine.residual_df_p (the second word also gets the
    dd-EFT treatment) — acceptable: callers treat the result as the truth."""
    return _residual_mw_call((u0, u1), f, n, h, interpret)


def _residual_mw_call(words, f, n: int, h: float, interpret: bool):
    nwords = len(words)
    rp, cp = f.shape
    assert (rp, cp) == padded_shape(n)
    itemsize = jnp.dtype(f.dtype).itemsize

    # buffers: nwords×2 word slots + 2 f slots + 2 out slots
    n_buffers = 2 * nwords + 4
    s = _VMEM_BUDGET_BYTES // (n_buffers * cp * itemsize)
    strip = max(4 * HALO, min((s // SUBLANE) * SUBLANE, 1024))
    strip = min(strip, rp)
    if strip >= rp:
        strip, owned, num_strips = rp, rp, 1
    else:
        owned = strip - 2 * HALO
        num_strips = math.ceil(rp / owned)

    kernel = partial(_residual_mw_kernel, n=n, rp=rp, cp=cp,
                     num_strips=num_strips, strip=strip, owned=owned,
                     inv_h2=1.0 / (h * h), nwords=nwords)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, cp), f.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (nwords + 1),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nwords, 2, strip, cp), f.dtype),
            pltpu.VMEM((2, strip, cp), f.dtype),
            pltpu.VMEM((2, strip, cp), f.dtype),
            pltpu.SemaphoreType.DMA((2, nwords + 1)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET_BYTES),
        interpret=interpret,
    )(*words, f)


def fused_jacobi_padded(u: jnp.ndarray, f: jnp.ndarray, n: int, h: float,
                        steps: int, omega: float = 1.0,
                        from_zero: bool = False,
                        interpret: bool = False) -> jnp.ndarray:
    """``steps`` damped-Jacobi sweeps on padded-layout arrays, ≤8 per HBM pass.

    Semantically identical to ``steps`` applications of
    ops.padded.jacobi_sweep_p / ops.stencils.jacobi_sweep (doSmoothing,
    MG_solver_CPU.cpp:573-604). Chunks calls when steps > 8.

    ``from_zero=True`` asserts the incoming iterate is identically zero
    (correction levels after the reference's memset): the first sweep is
    then closed-form and the first kernel call never reads ``u`` from HBM.
    """
    if steps <= 0:
        return u
    first = True
    while steps > 0:
        k = min(steps, MAX_FUSED_SWEEPS)
        u = _fused_jacobi_call(u, f, n, h, k, omega,
                               from_zero and first, interpret)
        steps -= k
        first = False
    return u

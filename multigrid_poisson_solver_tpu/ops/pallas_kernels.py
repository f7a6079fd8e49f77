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
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import LANE, SUBLANE, padded_shape

HALO = 8                      # rows of halo per cut edge; also max fused sweeps
MAX_FUSED_SWEEPS = HALO
# rb-GS consumes TWO halo rows per sweep (each colored half-sweep advances
# the trapezoid staleness front one row), so its fused-pass budget halves
MAX_FUSED_RBGS = HALO // 2

# VMEM budget for strip buffers. The chip (v5e) has 128 MiB VMEM/core (a
# 120 MiB scratch compiles and runs, probed on hardware); the original
# 13 MiB budget assumed a 16 MiB part and cost 1.33x halo-redundant compute
# at 8193 (64-row strips). Hardware sweep at 8193 k=8 (ms/sweep): 13 MiB
# 0.563, 24 0.423, 28 0.406, 32 0.349-0.416, 40 0.529, 48 0.555, 64 0.486,
# 100 0.475 -> optimum at 28-32 MiB (strip 144-168, red 1.10); deeper strips
# regress despite lower redundancy. Residual: 1.534 -> 1.211 ms (1.27x).
# Override for A/B via MG_VMEM_BUDGET_2D.
_VMEM_BUDGET_BYTES = int(
    os.environ.get("MG_VMEM_BUDGET_2D", 32 * 1024 * 1024))
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


# Lowering strategy for the ±1-shift neighbor sum (the VPU-bound inner loop
# of every sweep kernel). pltpu.roll ALWAYS lowers to tpu.dynamic_rotate even
# for constant shifts (jax/_src/pallas/mosaic/lowering.py:_roll_lowering_rule);
# slice+concat lowers to vector.extract_strided_slice + tpu.concatenate.
# Modes (perf knob, resolved at trace time):
#   "rotate"  — 4 dynamic_rotates (round-1 behavior)
#   "concat"  — 4 static slice+concat shifts
#   "mixed"   — slice+concat on sublanes (axis 0), rotate on lanes (axis 1)
_NB_MODE = "rotate"

# Sweep-body expression tree (perf knob, resolved at trace time):
#   "ref" — dst = u + a·(nb − 4u) − C, the reference increment order
#   "ilp" — dst = a·nb + (b·u − C), b = 1 − 4a (shorter post-nb chain)
# MEASURED EQUIVALENT on hardware (2026-08-19): the two forms produce
# BIT-IDENTICAL outputs and identical time (0.54 ms/sweep both, same
# window) — Mosaic canonicalizes the expression tree, so fp32
# reassociation is not a lever here. (The 3.3× "win" in an early
# exp_vpu_probe variant was an in-place-aliasing artifact of the probe's
# single-buffer update, not real.) Kept as a knob for future probes.
_SWEEP_FORM = os.environ.get("MG_SWEEP_FORM", "ref")

# Perf-probe knob for the ascend kernel's row-interleave (experiments only;
# "no_od" / "no_interleave" produce WRONG results by design).
_ASCEND_PROBE = None


def _nb_sum(u, rows: int, cols: int):
    """Σ of the four ±1 neighbors with periodic wrap (wrap rows/cols land in
    frozen cells, masked by the A coefficient)."""
    mode = _NB_MODE
    if jnp.dtype(u.dtype).itemsize != 4:
        # Mosaic's tpu.dynamic_rotate is 32-bit only ("Rotate with non-32-bit
        # data" compile error on real TPU); bf16/f64 states take the static
        # slice+concat lowering instead.
        mode = "concat"
    if mode == "rotate":
        return (pltpu.roll(u, shift=_i32(1), axis=0)
                + pltpu.roll(u, shift=_i32(rows - 1), axis=0)
                + pltpu.roll(u, shift=_i32(1), axis=1)
                + pltpu.roll(u, shift=_i32(cols - 1), axis=1))
    if mode == "concat":
        dn = jnp.concatenate([u[rows - 1:, :], u[:rows - 1, :]], axis=0)
        up = jnp.concatenate([u[1:, :], u[:1, :]], axis=0)
        rt = jnp.concatenate([u[:, cols - 1:], u[:, :cols - 1]], axis=1)
        lt = jnp.concatenate([u[:, 1:], u[:, :1]], axis=1)
        return dn + up + rt + lt
    if mode == "mixed":
        dn = jnp.concatenate([u[rows - 1:, :], u[:rows - 1, :]], axis=0)
        up = jnp.concatenate([u[1:, :], u[:1, :]], axis=0)
        return (dn + up
                + pltpu.roll(u, shift=_i32(1), axis=1)
                + pltpu.roll(u, shift=_i32(cols - 1), axis=1))
    raise ValueError(f"unknown _NB_MODE {mode!r}")


def _wrap_shift(u, shift: int, axis: int):
    """Static wrap-shift by `shift` along `axis`, dtype-safe.

    pltpu.roll lowers to tpu.dynamic_rotate which is 32-bit-only; the
    slice+concat form lowers for every dtype, so non-4-byte states
    (bf16/f64) always take it."""
    size = u.shape[axis]
    if jnp.dtype(u.dtype).itemsize == 4:
        return pltpu.roll(u, shift=_i32(shift), axis=axis)
    s = shift % size
    if s == 0:
        return u
    if axis == 0:
        return jnp.concatenate([u[size - s:, :], u[:size - s, :]], axis=0)
    return jnp.concatenate([u[:, size - s:], u[:, :size - s]], axis=1)


def _fused_jacobi_kernel(offs_smem, u_hbm, f_hbm, *rest,
                         n: int, erows: int, cp: int, out_rows: int,
                         ext_r: int, ext_c: int, steps: int,
                         num_strips: int, strip: int, owned: int,
                         h2: float, omega: float, from_zero: bool,
                         err_mode=None, per_sweep: bool = False,
                         smoother: str = "jacobi"):
    """Kernel body, generalized over halo-extended shard blocks.

    Single-device: u/f/out are all (erows, cp) with ext_r = 0 and the offset
    vector zero. Sharded (parallel.pallas_shard): u/f are a shard's block
    EXTENDED by ext_r halo rows on each side (erows = out_rows + 2·ext_r, the
    halos freshly ppermuted from ring neighbors), ``out`` is the bare block,
    and offs_smem = (row0, col0) holds the *global* grid coordinates of the
    extended block's [0, 0] so the Dirichlet/padding masks stay correct under
    partitioning. Trapezoid staleness at the extended edges is bounded by the
    same ≤8-sweep argument as interior strip cuts (module docstring).

    ``err_mode`` fuses the smoothing-error reduction into the same HBM pass
    (the reference's ker_Smoothing_GPU fusion, MG_solver_GPU.cu:584-661):
      * "gpu"   — Σ|Δu| of the final sweep over owned∩interior cells;
      * "cpu"   — Σ|residual(u_final)| over the even color, computed from
        one EXTRA in-VMEM sweep (Δu_{k+1} = (ω/4)h²·r(u_k)), no extra HBM
        traffic — requires steps ≤ 7 so the neighbors feeding the extra
        sweep are trapezoid-exact;
      * "clean" — same extra sweep, all interior cells.
    The raw partial lands in a (1, 1) SMEM output; callers scale it.

    ``per_sweep`` (trigger batching, requires err_mode and not from_zero):
    emit ONE raw partial per iterate u_1..u_steps into a (1, steps) SMEM
    output instead of a single final-iterate scalar. The per-sweep values
    are free by the identity Δ_{s+1} = u_{s+1} − u_s = (ω/4)·h²·r(u_s):
    the cpu/clean metric of iterate u_s is |Δ_{s+1}| (captured during sweep
    s+1, plus one extra in-VMEM sweep for u_steps), the gpu metric of u_s
    is |Δ_s| (captured during sweep s itself).

    ``smoother="rbgs"``: red-black Gauss-Seidel sweeps instead of Jacobi
    (the reference's paired ker_GaussSeideleven/odd_GPU kernels,
    MG_solver_GPU.cu:663-795, as checkerboard parity masks inside this strip
    pipeline). Each sweep is two masked half-updates — even color then odd,
    the odd half reading the fresh even values — so a sweep consumes TWO
    trapezoid halo rows: ≤4 sweeps per pass (≤3 with the cpu/clean fused
    error's extra in-VMEM residual sweep). ω is ignored (GS has no damping
    in the reference); err_mode="gpu" and per_sweep are jacobi-only.
    """
    if err_mode is None:
        out_hbm, = rest[:1]
        rest = rest[1:]
    else:
        out_hbm, err_smem = rest[:2]
        rest = rest[2:]
    if smoother == "rbgs":
        u_slots, fc_slots, work, a_buf, modd_buf, load_sems, out_sems = rest
    else:
        u_slots, fc_slots, work, a_buf, load_sems, out_sems = rest
    row0 = offs_smem[0]
    col0 = offs_smem[1]

    def load_start(i):
        # owned, HALO, erows, strip are all multiples of 8, so the clip
        # result is too — but Mosaic's alignment prover can't see through
        # clip/mul, hence the explicit hints.
        return _mul8(jnp.clip(_i32(i) * _i32(owned) + _i32(ext_r - HALO),
                              _i32(0), _i32(erows - strip)))

    def write_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned), _i32(0),
                              _i32(out_rows - owned)))

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
        wlo = _mul8(wstart + _i32(ext_r) - load_start(i))
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wlo, owned),
                       pl.ds(ext_c, cp - 2 * ext_c)],
            out_hbm.at[pl.ds(wstart, owned), :],
            out_sems.at[slot])

    for cp_ in load_copies(_i32(0), _i32(0)):
        cp_.start()

    def body(i, acc):
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
        g = rows + start_c + row0
        gc = cols + col0
        ok_global = ((g >= 1) & (g <= n - 2)           # Dirichlet + pad rows
                     & (gc >= 1) & (gc <= n - 2))      # Dirichlet + pad cols
        # cut edges frozen: strip edges (rows) and — for column-sharded
        # blocks — the lane-halo edges (a no-op single-device: col 0 is the
        # global boundary and col cp−1 is padding, both already masked)
        ok = (ok_global & (rows >= 1) & (rows <= strip - 2)
              & (cols >= 1) & (cols <= cp - 2))
        if smoother == "rbgs":
            # checkerboard parity in GLOBAL coordinates (the reference's GS
            # even/odd split, MG_solver_CPU.cpp:996-1055): a_buf holds the
            # even-color update mask, modd_buf the odd; fc keeps the raw
            # h²·f (each half-update divides by 4 in-place, no ω folding)
            par_even = (g + gc) % 2 == 0
            one = jnp.ones((), u_hbm.dtype)
            zero = jnp.zeros((), u_hbm.dtype)
            a_buf[:] = jnp.where(ok & par_even, one, zero)
            modd_buf[:] = jnp.where(ok & ~par_even, one, zero)
            fc_slots[slot] = (jnp.asarray(h2, u_hbm.dtype)
                              * fc_slots[slot][:])
            if from_zero:
                # GS has no closed form past the even half (the odd half
                # reads fresh even values); just materialize the zero
                # iterate in VMEM and skip the u read (the caller already
                # skipped its DMA)
                u_slots[slot] = jnp.zeros((strip, cp), u_hbm.dtype)
        else:
            a = jnp.where(ok, jnp.float32(0.25 * omega), jnp.float32(0.0)
                          ).astype(u_hbm.dtype)
            a_buf[:] = a
            raw_f = fc_slots[slot]          # read before the C overwrite
            fc_slots[slot] = a * (jnp.asarray(h2, u_hbm.dtype) * raw_f)

            if from_zero:
                # closed-form sweep 1 from u≡0: u₁ = −(ω/4)·h²·f on the
                # global interior (exact everywhere, including the strip
                # edges — no neighbor dependence — so the trapezoid only
                # needs steps−1 halo rows, which HALO ≥ steps covers)
                u_slots[slot] = jnp.where(
                    ok_global,
                    -(jnp.asarray(0.25 * omega, u_hbm.dtype)
                      * (jnp.asarray(h2, u_hbm.dtype) * raw_f)),
                    jnp.zeros((strip, cp), u_hbm.dtype))

        # --- k sweeps, pure fp32 vector arithmetic --------------------------
        def nb_sum(u):
            return _nb_sum(u, strip, cp)

        if smoother == "rbgs":
            def half(src, dst, m):
                # one colored half-update: u = (Σnb − h²f)/4 on the mask's
                # color, unchanged elsewhere (bit-identical op order to
                # ops.padded.redblack_gs_sweep_p / stencils.redblack_gs_sweep)
                u = src[:]
                val = 0.25 * (nb_sum(u) - fc_slots[slot][:])
                dst[:] = jnp.where(m[:] != 0, val, u)

            def delta_of(fin):
                # Δ of one extra ω=1 JACOBI sweep = (h²/4)·r(u_final) on
                # unfrozen interior cells (even+odd masks sum to the ok
                # mask) — the same residual identity the jacobi err path
                # uses; callers rescale by 4/h²
                return (a_buf[:] + modd_buf[:]) * (
                    0.25 * (nb_sum(fin) - 4.0 * fin - fc_slots[slot][:]))
        elif _SWEEP_FORM == "ilp":
            # dependency-chain-reduced body: dst = a·nb + (b·u − C) with
            # b = 1 − 4a. Measured BIT-IDENTICAL output and time vs the
            # reference form on hardware — Mosaic canonicalizes the
            # expression DAG (see the _SWEEP_FORM note above; an early
            # probe's 3.3x "win" was a single-buffer aliasing artifact).
            # Kept as a knob for future probes.
            bv = 1.0 - 4.0 * a

            def sweep(src, dst):
                u = src[:]
                dst[:] = a_buf[:] * nb_sum(u) + (bv * u - fc_slots[slot][:])

            def delta_of(fin):
                """Δ of one more sweep, bit-exact vs sweep(): dst − u."""
                return (a_buf[:] * nb_sum(fin)
                        + (bv * fin - fc_slots[slot][:])) - fin
        else:
            def sweep(src, dst):
                u = src[:]
                dst[:] = (u + a_buf[:] * (nb_sum(u) - 4.0 * u)
                          - fc_slots[slot][:])

            def delta_of(fin):
                return a_buf[:] * (nb_sum(fin) - 4.0 * fin) \
                    - fc_slots[slot][:]

        # rbgs: from_zero saves only the u read (no closed-form shortcut —
        # the odd half already depends on fresh even values)
        n_sweeps = steps - 1 if (from_zero and smoother != "rbgs") else steps
        bufs = [u_slots.at[slot], work]

        if err_mode is not None:
            # non-overlapping ownership for the reduction: out row o belongs
            # to strip i iff i·owned ≤ o < min((i+1)·owned, out_rows) —
            # unlike the (harmlessly overlapping) clamped write windows
            o = rows + (start_c - _i32(ext_r))
            sel = (ok_global & (o >= _i32(i) * _i32(owned))
                   & (o < jnp.minimum((_i32(i) + 1) * _i32(owned),
                                      _i32(out_rows))))
            if ext_c:
                # column-sharded shard block: the lane halos belong to the
                # neighbor shard — exclude them from the psum'd partial
                sel = sel & (cols >= _i32(ext_c)) & (cols < _i32(cp - ext_c))
            if err_mode == "cpu":
                # the reference's color bug: even-color cells only
                # (caller doubles the sum), MG_solver_CPU.cpp:606-622
                selc = sel & ((g + gc) % 2 == 0)
            else:
                selc = sel

        if per_sweep:
            # trigger batching: per-iterate raw partials (see docstring).
            # Sweeps keep the exact op order of the plain path (iterates stay
            # bit-identical to the unbatched kernel); diffs come from buffer
            # subtraction, so the cpu/clean per-iterate metric matches the
            # single-err kernel up to one fp32 reassociation (~1e-7 rel).
            def masked_sum(d, m):
                # accumulate in f32 regardless of state dtype: Mosaic has no
                # scalar bf16 addf, and a 10⁷-term bf16 sum is meaningless
                v = jnp.abs(d).astype(jnp.float32)
                return jnp.sum(jnp.where(m, v, jnp.zeros_like(v)))

            parts = list(acc)
            for s in range(1, n_sweeps + 1):
                u = bufs[(s - 1) % 2][:]
                sweep(bufs[(s - 1) % 2], bufs[s % 2])
                if err_mode == "gpu":
                    parts[s - 1] = parts[s - 1] + masked_sum(
                        bufs[s % 2][:] - u, selc)
                elif s >= 2:
                    parts[s - 2] = parts[s - 2] + masked_sum(
                        bufs[s % 2][:] - u, selc)
            if err_mode != "gpu":
                fin = bufs[n_sweeps % 2][:]
                d = delta_of(fin)
                parts[n_sweeps - 1] = (parts[n_sweeps - 1]
                                       + masked_sum(d, selc))
            part = tuple(parts)
        elif smoother == "rbgs":
            # 2k masked half-updates, even color then odd per sweep; the
            # even total always parks the final iterate back in the slot
            # buffer for the direct out-DMA
            for s in range(2 * n_sweeps):
                half(bufs[s % 2], bufs[(s + 1) % 2],
                     a_buf if s % 2 == 0 else modd_buf)

            part = acc
            if err_mode is not None:
                val = jnp.abs(delta_of(bufs[0][:])).astype(jnp.float32)
                part = acc + jnp.sum(jnp.where(selc, val,
                                               jnp.zeros_like(val)))
        else:
            for s in range(n_sweeps):
                sweep(bufs[s % 2], bufs[(s + 1) % 2])

            part = acc
            if err_mode is not None:
                fin = bufs[n_sweeps % 2][:]
                if err_mode == "gpu":
                    prev = (jnp.zeros((strip, cp), u_hbm.dtype)
                            if (from_zero and n_sweeps == 0)
                            else bufs[(n_sweeps - 1) % 2][:])
                    val = jnp.abs(fin - prev)
                    sel = selc
                else:
                    # one extra in-VMEM sweep: Δu_{k+1} = (ω/4)·h²·r(u_k) on
                    # unfrozen cells — the residual of the FINAL iterate with
                    # zero extra HBM traffic (caller rescales by 4/(ω·h²))
                    val = jnp.abs(delta_of(fin))
                    sel = selc
                val = val.astype(jnp.float32)
                part = acc + jnp.sum(jnp.where(sel, val, jnp.zeros_like(val)))

        if smoother != "rbgs" and n_sweeps % 2 == 1:
            # result must sit in the slot buffer for the direct out-DMA
            u_slots[slot] = work[:]

        out_copy(i, slot).start()
        return part

    k_err = steps - 1 if from_zero else steps
    acc0 = (tuple(jnp.zeros((), jnp.float32) for _ in range(k_err))
            if per_sweep else jnp.zeros((), jnp.float32))
    total = jax.lax.fori_loop(_i32(0), _i32(num_strips), body, acc0,
                              unroll=False)
    if per_sweep:
        for s in range(k_err):
            err_smem[0, s] = total[s]
    elif err_mode is not None:
        err_smem[0, 0] = total

    # drain the last (up to) two outstanding writes
    last = num_strips - 1     # static python ints: no traced math needed

    if num_strips >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()

    out_copy(_i32(last), _i32(last % 2)).wait()


def _check_padded(shape, n):
    rp, cp = shape
    assert rp % SUBLANE == 0 and cp % LANE == 0 and rp >= n and cp >= n, (
        f"expected a tile-aligned padded layout covering n={n}, got {shape}")


def _strip_geometry(erows: int, out_rows: int, cp: int, itemsize: int):
    """(strip, owned, num_strips) tiling the ``out_rows`` owned rows of an
    ``erows``-row (possibly halo-extended) block."""
    strip = min(_strip_rows(cp, itemsize), erows)
    if strip >= erows:
        return erows, out_rows, 1
    owned = strip - 2 * HALO
    return strip, owned, math.ceil(out_rows / owned)


def _fused_jacobi_shard_call(offs, u, f, n: int, h: float, steps: int,
                             omega: float, ext_r: int, from_zero: bool,
                             interpret: bool, ext_c: int = 0, err_mode=None,
                             per_sweep: bool = False,
                             smoother: str = "jacobi"):
    """One ≤8-sweep fused pass on a (possibly halo-extended) block.

    ``offs`` = int32 (2,) global (row, col) coordinates of u[0, 0];
    ``ext_r`` halo rows / ``ext_c`` halo lanes on each side are consumed but
    not written: the output is (erows − 2·ext_r, cp − 2·ext_c).
    With ``err_mode`` set, also returns the raw fused error partial
    (see _fused_jacobi_kernel); the caller applies metric scaling.
    ``per_sweep`` returns a (steps,) vector of per-iterate raw partials
    instead (trigger batching; requires err_mode, no from_zero).
    ``smoother="rbgs"``: red-black GS half-sweep pairs, ≤4 sweeps per pass
    (≤3 with cpu/clean err); gpu err and per_sweep stay jacobi-only.
    """
    erows, cp = u.shape
    out_rows = erows - 2 * ext_r
    itemsize = jnp.dtype(u.dtype).itemsize
    strip, owned, num_strips = _strip_geometry(erows, out_rows, cp, itemsize)
    if per_sweep:
        assert err_mode is not None and not from_zero
    if smoother == "rbgs":
        assert err_mode != "gpu" and not per_sweep, (
            "rbgs fuses only the cpu/clean error metric")
        halves = 2 * steps + (1 if err_mode in ("cpu", "clean") else 0)
        assert halves <= HALO, (
            f"fused rbgs pass: 2·steps(+err) must fit the {HALO}-row halo, "
            f"got steps={steps}, err={err_mode}")
    elif err_mode in ("cpu", "clean"):
        k = steps - 1 if from_zero else steps
        assert k <= HALO - 1, (
            f"fused cpu/clean error needs ≤{HALO - 1} sweeps per pass, "
            f"got {k} (the extra in-VMEM residual sweep consumes one halo row)")

    kernel = partial(_fused_jacobi_kernel, n=n, erows=erows, cp=cp,
                     out_rows=out_rows, ext_r=ext_r, ext_c=ext_c, steps=steps,
                     num_strips=num_strips, strip=strip, owned=owned,
                     h2=h * h, omega=omega, from_zero=from_zero,
                     err_mode=err_mode, per_sweep=per_sweep,
                     smoother=smoother)

    err_cols = steps if per_sweep else 1
    out_shape = jax.ShapeDtypeStruct((out_rows, cp - 2 * ext_c), u.dtype)
    out_spec = pl.BlockSpec(memory_space=pl.ANY)
    if err_mode is not None:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, err_cols), jnp.float32))
        out_spec = (out_spec, pl.BlockSpec(memory_space=pltpu.SMEM))

    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, strip, cp), u.dtype),   # u load slots
            pltpu.VMEM((2, strip, cp), u.dtype),   # f load slots -> C coeff
            pltpu.VMEM((strip, cp), u.dtype),      # ping-pong work buffer
            pltpu.VMEM((strip, cp), u.dtype),      # A coeff / even mask
        ] + ([pltpu.VMEM((strip, cp), u.dtype)]    # odd-color mask (rbgs)
             if smoother == "rbgs" else []) + [
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET_BYTES),
        interpret=interpret,
    )(offs, u, f)
    if per_sweep:
        return result[0], result[1][0, :]
    if err_mode is not None:
        return result[0], result[1][0, 0]
    return result


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "from_zero",
                                   "interpret", "smoother"))
def _fused_jacobi_call(u, f, n: int, h: float, steps: int, omega: float,
                       from_zero: bool, interpret: bool,
                       smoother: str = "jacobi"):
    _check_padded(u.shape, n)
    return _fused_jacobi_shard_call(
        jnp.zeros((2,), jnp.int32), u, f, n, h, steps, omega,
        ext_r=0, from_zero=from_zero, interpret=interpret, smoother=smoother)


def _fused_descend_kernel(offs_smem, u_hbm, f_hbm, out_hbm, dw_hbm, *rest,
                          n: int, erows: int, cp: int, out_rows: int,
                          ext_r: int, ext_c: int, steps: int,
                          num_strips: int, strip: int, owned: int,
                          h2: float, omega: float, from_zero: bool,
                          restriction: str,
                          pw: int, powned: int, lh: int, num_panels: int,
                          err_mode=None):
    """The WHOLE descend leg in one HBM pass: k Jacobi sweeps + residual +
    row-restriction (+ optional fused smoothing error).

    Replaces smooth → getResidual → doRestriction (MG_solver_CPU.cpp:574-680;
    three kernel launches re-reading device memory in the GPU reference) with
    a single strip pipeline. The residual of the final iterate is recovered
    from one EXTRA in-VMEM sweep (Δu_{k+1} = (ω/4)·(Σnb − 4u − h²f), so
    r(u_k) = 4Δ/(ω·h²)) — it never touches HBM. Requires a 2:1 vertex-aligned
    coarse level (n = 2m − 1, the odd-halve rule): restriction then samples
    even rows/cols, with the optional full-weighting [¼,½,¼]² pre-smooth.

    Outputs: the smoothed fine iterate (rp, cp) and ``dwide`` (rp/2, cp) —
    the NEGATED, restriction-combined residual at coarse rows × FINE lanes.
    Lane decimation (even lanes) happens outside in XLA: Mosaic has no lane
    de-interleave, and the half-height array makes that pass cheap. Sweep cap:
    steps ≤ 6 for full weighting (the ±1-row combine consumes one more halo
    row), ≤ 7 for sampling.

    Row-halving alignment: block rows and owned are multiples of 16, so
    coarse windows (fine/2) stay ×8 for the dwide DMA (layout.ROW_PAD).

    Generalized over halo-extended shard blocks like _fused_jacobi_kernel:
    offs_smem = global (row0, col0) of u[0, 0]; ext_r/ext_c halo rows/lanes
    are consumed but not written (out_rows = erows − 2·ext_r; dwide gets
    out_rows/2 rows × cp − 2·ext_c lanes).

    2-D tiling: like _fused_ascend_kernel, wide grids are additionally cut
    into lane panels (pw lanes, lh-lane halos, panel-major iteration) so
    strips stay tall — full-width descend strips at 8193² are 48 rows
    (owned 32, 1.5× redundant). Panels require ext_c == 0.
    """
    if err_mode is None:
        (u_slots, fc_slots, work, a_buf, dec_scr, dec_out,
         load_sems, out_sems, dw_sems) = rest
    else:
        err_smem = rest[0]
        (u_slots, fc_slots, work, a_buf, dec_scr, dec_out,
         load_sems, out_sems, dw_sems) = rest[1:]
    fw = restriction == "full_weighting"
    oc = owned // 2
    row0 = offs_smem[0]
    col0 = offs_smem[1]
    num_iter = num_panels * num_strips

    def pi(idx):
        if num_panels == 1:
            return _i32(0), _i32(idx)
        return _i32(idx) // _i32(num_strips), jax.lax.rem(
            _i32(idx), _i32(num_strips))

    def load_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned) + _i32(ext_r - HALO),
                              _i32(0), _i32(erows - strip)))

    def write_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned), _i32(0),
                              _i32(out_rows - owned)))

    if num_panels == 1:
        out_wcols = cp - 2 * ext_c

        def col_start(p):
            return _i32(0)

        def write_col(p):
            return _i32(0)

        def wcl(p):
            return _i32(ext_c)
    else:
        assert ext_c == 0
        out_wcols = powned

        def col_start(p):
            return _mul128(jnp.clip(_i32(p) * _i32(powned) - _i32(lh),
                                    _i32(0), _i32(cp - pw)))

        def write_col(p):
            return _mul128(jnp.clip(_i32(p) * _i32(powned), _i32(0),
                                    _i32(cp - powned)))

        def wcl(p):
            return _mul128(write_col(p) - col_start(p))

    def load_copies(idx, slot):
        p, i = pi(idx)
        s = load_start(i)
        cs = col_start(p)
        copies = (pltpu.make_async_copy(
            f_hbm.at[pl.ds(s, strip), pl.ds(cs, pw)],
            fc_slots.at[slot], load_sems.at[slot, _i32(1)]),)
        if not from_zero:
            copies += (pltpu.make_async_copy(
                u_hbm.at[pl.ds(s, strip), pl.ds(cs, pw)], u_slots.at[slot],
                load_sems.at[slot, _i32(0)]),)
        return copies

    def out_copy(idx, slot):
        p, i = pi(idx)
        wstart = write_start(i)
        wlo = _mul8(wstart + _i32(ext_r) - load_start(i))
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wlo, owned), pl.ds(wcl(p), out_wcols)],
            out_hbm.at[pl.ds(wstart, owned), pl.ds(write_col(p), out_wcols)],
            out_sems.at[slot])

    def dw_copy(idx, slot):
        p, i = pi(idx)
        cw = _mul8(write_start(i) // _i32(2))
        return pltpu.make_async_copy(
            dec_out.at[slot, :, pl.ds(wcl(p), out_wcols)],
            dw_hbm.at[pl.ds(cw, oc), pl.ds(write_col(p), out_wcols)],
            dw_sems.at[slot])

    for cp_ in load_copies(0, _i32(0)):
        cp_.start()

    def body(idx, acc):
        p, i = pi(idx)
        slot = jax.lax.rem(_i32(idx), _i32(2))
        nxt = jax.lax.rem(_i32(idx) + _i32(1), _i32(2))

        @pl.when(idx + 1 < num_iter)
        def _():
            @pl.when(idx >= 1)
            def _():
                out_copy(idx - 1, nxt).wait()
                dw_copy(idx - 1, nxt).wait()
            for cp_ in load_copies(idx + 1, nxt):
                cp_.start()

        for cp_ in load_copies(idx, slot):
            cp_.wait()

        start_c = load_start(i)
        cs = col_start(p)
        rows = jax.lax.broadcasted_iota(jnp.int32, (strip, pw), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (strip, pw), 1)
        g = rows + start_c + row0
        gc = cols + cs + col0
        ok_global = ((g >= 1) & (g <= n - 2) & (gc >= 1) & (gc <= n - 2))
        ok = (ok_global & (rows >= 1) & (rows <= strip - 2)
              & (cols >= 1) & (cols <= pw - 2))
        a = jnp.where(ok, jnp.float32(0.25 * omega), jnp.float32(0.0)
                      ).astype(u_hbm.dtype)
        a_buf[:] = a
        raw_f = fc_slots[slot]
        fc_slots[slot] = a * (jnp.asarray(h2, u_hbm.dtype) * raw_f)

        if from_zero:
            u_slots[slot] = jnp.where(
                ok_global,
                -(jnp.asarray(0.25 * omega, u_hbm.dtype)
                  * (jnp.asarray(h2, u_hbm.dtype) * raw_f)),
                jnp.zeros((strip, pw), u_hbm.dtype))

        def nb_sum(u):
            return _nb_sum(u, strip, pw)

        def sweep(src, dst):
            u = src[:]
            dst[:] = u + a_buf[:] * (nb_sum(u) - 4.0 * u) - fc_slots[slot][:]

        n_sweeps = steps - 1 if from_zero else steps
        bufs = [u_slots.at[slot], work]
        for s in range(n_sweeps):
            sweep(bufs[s % 2], bufs[(s + 1) % 2])
        fin = bufs[n_sweeps % 2][:]

        # extra in-VMEM sweep: Δ = (ω/4)(Σnb − 4u − h²f); frozen cells give
        # Δ = 0 exactly (a and the folded source both vanish there)
        delta = a_buf[:] * (nb_sum(fin) - 4.0 * fin) - fc_slots[slot][:]

        part = acc
        if err_mode is not None:
            # exact ownership in BOTH dims (clamped windows overlap)
            o = rows + start_c - _i32(ext_r)
            oc_col = cols + cs - _i32(ext_c)
            sel = (ok_global & (o >= _i32(i) * _i32(owned))
                   & (o < jnp.minimum((_i32(i) + 1) * _i32(owned),
                                      _i32(out_rows))))
            if num_panels > 1:
                sel = (sel & (oc_col >= _i32(p) * _i32(powned))
                       & (oc_col < jnp.minimum((_i32(p) + 1) * _i32(powned),
                                               _i32(cp))))
            elif ext_c:
                # column-sharded shard block: the 128-lane halos are the
                # neighbor shard's interior — exclude them or the psum
                # double-counts
                sel = sel & (oc_col >= 0) & (oc_col < _i32(cp - 2 * ext_c))
            if err_mode == "gpu":
                prev = (jnp.zeros((strip, pw), u_hbm.dtype)
                        if (from_zero and n_sweeps == 0)
                        else bufs[(n_sweeps - 1) % 2][:])
                val = jnp.abs(fin - prev)
            else:
                val = jnp.abs(delta)
                if err_mode == "cpu":
                    sel = sel & ((g + gc) % 2 == 0)
            val = val.astype(jnp.float32)   # f32 partials (bf16-safe, exact)
            part = acc + jnp.sum(jnp.where(sel, val, jnp.zeros_like(val)))

        # negated residual for the coarse RHS (restrict(−r), the reference's
        # down-leg, MG_solver_CPU.cpp:274-287)
        rneg = delta * jnp.asarray(-4.0 / (omega * h2), u_hbm.dtype)
        if fw:
            # separable [¼,½,¼] pre-smooth (both axes); the even-row/col
            # sample below completes full weighting
            rneg = (0.25 * _wrap_shift(rneg, 1, axis=1)
                    + 0.5 * rneg
                    + 0.25 * _wrap_shift(rneg, pw - 1, axis=1))
            rneg = (0.25 * _wrap_shift(rneg, 1, axis=0)
                    + 0.5 * rneg
                    + 0.25 * _wrap_shift(rneg, strip - 1, axis=0))
        dec_scr[:] = rneg

        # even-row decimation via the sublane-split reshape (lane decimation
        # is the caller's cheap half-height XLA pass). Global parity of the
        # window's first row is even: wstart and the block origin are ×16.
        wstart = write_start(i)
        wlo = _mul8(wstart + _i32(ext_r) - start_c)
        win = dec_scr[pl.ds(wlo, owned), :]
        dec = win.reshape(oc, 2, pw)[:, 0, :]
        # coarse-row interior mask (m = (n+1)//2): fine row 2t ↔ coarse t
        crow = (jax.lax.broadcasted_iota(jnp.int32, (oc, pw), 0)
                + (wstart + row0 + _i32(ext_r)) // _i32(2))
        m_coarse = (n + 1) // 2
        keep = (crow >= 1) & (crow <= m_coarse - 2)
        dec_out[slot] = jnp.where(keep, dec, jnp.zeros_like(dec))
        dw_copy(idx, slot).start()

        if n_sweeps % 2 == 1:
            # result must sit in the slot buffer for the direct out-DMA
            u_slots[slot] = work[:]
        out_copy(idx, slot).start()
        return part

    total = jax.lax.fori_loop(_i32(0), _i32(num_iter), body,
                              jnp.zeros((), jnp.float32), unroll=False)
    if err_mode is not None:
        err_smem[0, 0] = total

    last = num_iter - 1
    if num_iter >= 2:
        out_copy(last - 1, _i32((last - 1) % 2)).wait()
        dw_copy(last - 1, _i32((last - 1) % 2)).wait()
    out_copy(last, _i32(last % 2)).wait()
    dw_copy(last, _i32(last % 2)).wait()


def _mul128(x):
    return pl.multiple_of(x, LANE)


def _fused_ascend_kernel(offs_smem, u_hbm, f_hbm, cw_hbm, out_hbm, *rest,
                         n: int, erows: int, cp: int, out_rows: int,
                         ext_r: int, ext_c: int, steps: int,
                         num_strips: int, strip: int, owned: int,
                         cwrows: int, h2: float, omega: float,
                         pw: int, powned: int, lh: int, num_panels: int,
                         err_mode=None):
    """The WHOLE ascend leg in one HBM pass: 2:1 row-prolongation + interior
    correction add + k post-sweeps (+ optional fused smoothing error).

    Replaces doProlongation + doGridAddition + doSmoothing
    (MG_solver_CPU.cpp:682-724, 566-571, 573-604). ``cw`` is the coarse
    solution already lane-expanded to fine width by the caller
    (ops.padded.prolong_lanes_p — the cheap half-height XLA pass); this
    kernel expands ROWS in VMEM via the sublane interleave reshape
    (fine 2t ← coarse t; fine 2t+1 ← ½(coarse t + t+1)), adds on the global
    interior, then sweeps. The correction is exact everywhere (coarse data
    has no staleness), so the usual ≤8-sweep trapezoid bound applies
    unchanged; fused cpu/clean error costs one halo row (≤7 sweeps).

    2-D tiling: the 3-correction-buffer footprint forces tiny full-width row
    strips (48 rows → 16 owned, 3× redundant compute at 8193² — measured).
    So the grid is also cut into LANE PANELS of ``pw`` lanes with ``lh``-lane
    halos (×128 each for DMA alignment); buffers shrink by the panel factor
    and strips grow to ~15× the rows. Iteration order is panel-major; the
    trapezoid argument applies per edge (lane staleness ≤ steps ≤ 8 ≤ lh).
    Panels require ext_c == 0 (column-sharded blocks keep one panel).
    """
    if err_mode is None:
        (u_slots, fc_slots, cw_slots, work, a_buf,
         load_sems, out_sems) = rest
    else:
        err_smem = rest[0]
        (u_slots, fc_slots, cw_slots, work, a_buf,
         load_sems, out_sems) = rest[1:]
    row0 = offs_smem[0]
    col0 = offs_smem[1]
    num_iter = num_panels * num_strips

    # 16-row halo (not 8): load offsets stay ×16, so the halved coarse-side
    # DMA offsets stay ×8 AND even-parity for the row interleave. Shard
    # blocks (ext_r = 16) reuse the same geometry: cw_hbm row 0 corresponds
    # to the coarse row of the extended block's fine row 0, so the in-kernel
    # coarse window offset stays load_start/2 unchanged.
    def pi(idx):
        if num_panels == 1:
            return _i32(0), _i32(idx)
        return _i32(idx) // _i32(num_strips), jax.lax.rem(
            _i32(idx), _i32(num_strips))

    def load_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned) + _i32(ext_r - 2 * HALO),
                              _i32(0), _i32(erows - strip)))

    def write_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned), _i32(0),
                              _i32(out_rows - owned)))

    if num_panels == 1:
        # single panel: pw == cp; writes span [ext_c, cp − ext_c)
        out_wcols = cp - 2 * ext_c

        def col_start(p):
            return _i32(0)

        def write_col(p):
            return _i32(0)

        def wcl(p):
            return _i32(ext_c)
    else:
        assert ext_c == 0
        out_wcols = powned

        def col_start(p):
            return _mul128(jnp.clip(_i32(p) * _i32(powned) - _i32(lh),
                                    _i32(0), _i32(cp - pw)))

        def write_col(p):
            return _mul128(jnp.clip(_i32(p) * _i32(powned), _i32(0),
                                    _i32(cp - powned)))

        def wcl(p):
            return _mul128(write_col(p) - col_start(p))

    def load_copies(idx, slot):
        p, i = pi(idx)
        s = load_start(i)
        cs = col_start(p)
        cws = _mul8(s // _i32(2))
        return (pltpu.make_async_copy(
                    u_hbm.at[pl.ds(s, strip), pl.ds(cs, pw)],
                    u_slots.at[slot], load_sems.at[slot, _i32(0)]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(s, strip), pl.ds(cs, pw)],
                    fc_slots.at[slot], load_sems.at[slot, _i32(1)]),
                pltpu.make_async_copy(
                    cw_hbm.at[pl.ds(cws, cwrows), pl.ds(cs, pw)],
                    cw_slots.at[slot], load_sems.at[slot, _i32(2)]))

    def out_copy(idx, slot):
        p, i = pi(idx)
        wstart = write_start(i)
        wlo = _mul8(wstart + _i32(ext_r) - load_start(i))
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wlo, owned), pl.ds(wcl(p), out_wcols)],
            out_hbm.at[pl.ds(wstart, owned), pl.ds(write_col(p), out_wcols)],
            out_sems.at[slot])

    for cp_ in load_copies(0, _i32(0)):
        cp_.start()

    def body(idx, acc):
        p, i = pi(idx)
        slot = jax.lax.rem(_i32(idx), _i32(2))
        nxt = jax.lax.rem(_i32(idx) + _i32(1), _i32(2))

        @pl.when(idx + 1 < num_iter)
        def _():
            @pl.when(idx >= 1)
            def _():
                out_copy(idx - 1, nxt).wait()
            for cp_ in load_copies(idx + 1, nxt):
                cp_.start()

        for cp_ in load_copies(idx, slot):
            cp_.wait()

        start_c = load_start(i)
        cs = col_start(p)
        rows = jax.lax.broadcasted_iota(jnp.int32, (strip, pw), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (strip, pw), 1)
        g = rows + start_c + row0
        gc = cols + cs + col0
        ok_global = ((g >= 1) & (g <= n - 2) & (gc >= 1) & (gc <= n - 2))
        ok = (ok_global & (rows >= 1) & (rows <= strip - 2)
              & (cols >= 1) & (cols <= pw - 2))
        if _ASCEND_PROBE == "const_coeff":
            # timing probe (WRONG at edges by design): skip the per-strip
            # iota mask build entirely — measures the coefficient-rebuild
            # share of the kernel
            a = jnp.full((strip, pw), jnp.float32(0.25 * omega),
                         u_hbm.dtype)
        else:
            a = jnp.where(ok, jnp.float32(0.25 * omega), jnp.float32(0.0)
                          ).astype(u_hbm.dtype)
        a_buf[:] = a
        raw_f = fc_slots[slot]
        fc_slots[slot] = a * (jnp.asarray(h2, u_hbm.dtype) * raw_f)

        # --- in-VMEM 2:1 row prolongation + interior add -------------------
        # local fine row r ↔ global fine row start_c + r; start_c is even,
        # so local parity == global parity: even rows copy coarse row r/2,
        # odd rows average r/2 and r/2 + 1 (doProlongation's aligned case)
        cw = cw_slots[slot]
        ev = cw[0:strip // 2, :]
        if _ASCEND_PROBE == "no_interleave":      # timing probe: skip it all
            corr = u_slots[slot][:]
        else:
            od = (ev if _ASCEND_PROBE == "no_od"  # probe: skip the average
                  else 0.5 * (ev + cw[1:strip // 2 + 1, :]))
            corr = jnp.stack([ev, od], axis=1).reshape(strip, pw)
        if _ASCEND_PROBE == "const_coeff":
            # probe pairs with the constant-a branch above: unmasked add so
            # the iota masks vanish from the kernel entirely
            u_slots[slot] = u_slots[slot][:] + corr
        else:
            u_slots[slot] = u_slots[slot][:] + jnp.where(
                ok_global, corr, jnp.zeros_like(corr))

        def nb_sum(u):
            return _nb_sum(u, strip, pw)

        def sweep(src, dst):
            u = src[:]
            dst[:] = u + a_buf[:] * (nb_sum(u) - 4.0 * u) - fc_slots[slot][:]

        bufs = [u_slots.at[slot], work]
        for s in range(steps):
            sweep(bufs[s % 2], bufs[(s + 1) % 2])
        fin = bufs[steps % 2][:]

        part = acc
        if err_mode is not None:
            # exact ownership in BOTH dims (clamped windows overlap)
            o = rows + start_c - _i32(ext_r)
            oc = cols + cs - _i32(ext_c)
            sel = (ok_global & (o >= _i32(i) * _i32(owned))
                   & (o < jnp.minimum((_i32(i) + 1) * _i32(owned),
                                      _i32(out_rows))))
            if num_panels > 1:
                sel = (sel & (oc >= _i32(p) * _i32(powned))
                       & (oc < jnp.minimum((_i32(p) + 1) * _i32(powned),
                                           _i32(cp))))
            elif ext_c:
                # column-sharded shard block: exclude the 128-lane halos
                # (the neighbor shard's interior) from the psum'd partial
                sel = sel & (oc >= 0) & (oc < _i32(cp - 2 * ext_c))
            if err_mode == "gpu":
                prev = bufs[(steps - 1) % 2][:]
                val = jnp.abs(fin - prev)
            else:
                val = jnp.abs(a_buf[:] * (nb_sum(fin) - 4.0 * fin)
                              - fc_slots[slot][:])
                if err_mode == "cpu":
                    sel = sel & ((g + gc) % 2 == 0)
            val = val.astype(jnp.float32)
            part = acc + jnp.sum(jnp.where(sel, val, jnp.zeros_like(val)))

        if steps % 2 == 1:
            u_slots[slot] = work[:]
        out_copy(idx, slot).start()
        return part

    total = jax.lax.fori_loop(_i32(0), _i32(num_iter), body,
                              jnp.zeros((), jnp.float32), unroll=False)
    if err_mode is not None:
        err_smem[0, 0] = total

    last = num_iter - 1
    if num_iter >= 2:
        out_copy(last - 1, _i32((last - 1) % 2)).wait()
    out_copy(last, _i32(last % 2)).wait()


def _residual_kernel(offs_smem, u_hbm, f_hbm, out_hbm,
                     u_slots, f_slots, out_slots,
                     load_sems, out_sems,
                     *, n: int, erows: int, cp: int, out_rows: int,
                     ext_r: int, ext_c: int, num_strips: int,
                     strip: int, owned: int, inv_h2: float, negate: bool):
    """Strip-pipelined 5-point residual: r = (Σnb − 4u)/h² − f on the
    interior, 0 elsewhere; optionally negated (the restriction source).

    Single pass over HBM (read u, f; write r) — XLA's roll-based residual
    materializes four shifted copies (~44 B/point observed); this is 12.
    Generalized over halo-extended shard blocks exactly like
    ``_fused_jacobi_kernel`` (offs_smem = global (row0, col0); ext_r halo
    rows consumed, out_rows = erows − 2·ext_r written).
    """
    row0 = offs_smem[0]
    col0 = offs_smem[1]

    def load_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned) + _i32(ext_r - HALO),
                              _i32(0), _i32(erows - strip)))

    def write_start(i):
        return _mul8(jnp.clip(_i32(i) * _i32(owned), _i32(0),
                              _i32(out_rows - owned)))

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
        wlo = _mul8(wstart + _i32(ext_r) - load_start(i))
        return pltpu.make_async_copy(
            out_slots.at[slot, pl.ds(wlo, owned),
                         pl.ds(ext_c, cp - 2 * ext_c)],
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
        nb = _nb_sum(u, strip, cp)
        r = (nb - 4.0 * u) * inv_h2 - f_slots[slot]
        if negate:
            r = -r

        rows = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 1)
        g = rows + start_c + row0
        gc = cols + col0
        ok = ((g >= 1) & (g <= n - 2) & (gc >= 1) & (gc <= n - 2))
        out_slots[slot] = jnp.where(ok, r, jnp.zeros_like(r))
        out_copy(i, slot).start()
        return _i32(0)

    jax.lax.fori_loop(_i32(0), _i32(num_strips), body, _i32(0), unroll=False)

    last = num_strips - 1     # static python ints: no traced math needed

    if num_strips >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()

    out_copy(_i32(last), _i32(last % 2)).wait()


def _residual_shard_call(offs, u, f, n: int, h: float, negate: bool,
                         ext_r: int, interpret: bool, ext_c: int = 0):
    erows, cp = u.shape
    out_rows = erows - 2 * ext_r
    itemsize = jnp.dtype(u.dtype).itemsize
    strip, owned, num_strips = _strip_geometry(erows, out_rows, cp, itemsize)

    kernel = partial(_residual_kernel, n=n, erows=erows, cp=cp,
                     out_rows=out_rows, ext_r=ext_r, ext_c=ext_c,
                     num_strips=num_strips, strip=strip, owned=owned,
                     inv_h2=1.0 / (h * h), negate=negate)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, cp - 2 * ext_c), u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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
    )(offs, u, f)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "restriction",
                                   "compat", "want_err", "from_zero",
                                   "interpret"))
def fused_descend_padded(u, f, n: int, h: float, steps: int,
                         omega: float = 1.0, restriction: str = "sampling",
                         compat=True, want_err: bool = False,
                         from_zero: bool = False, interpret: bool = False):
    """The descend leg fused: ``steps`` sweeps + residual + row-restriction
    in ONE HBM pass (see _fused_descend_kernel). Returns
    (u_new, dwide, err) — ``dwide`` is the (rp/2, cp) row-restricted negated
    residual awaiting the caller's lane decimation
    (ops.padded.restrict_lanes_p); ``err`` is None unless ``want_err``.

    Constraints: n = 2m−1 vertex-aligned coarsening; 1 ≤ steps ≤ 6 for
    full_weighting (7 for sampling, 6 with a fused cpu/clean error — each
    ±1-row consumer costs one halo row).
    """
    _check_padded(u.shape, n)
    err_mode = (None if not want_err
                else "gpu" if compat == "gpu" else "cpu" if compat
                else "clean")
    return _fused_descend_shard_call(
        jnp.zeros((2,), jnp.int32), u, f, n, h, steps, omega, restriction,
        err_mode, ext_r=0, ext_c=0, from_zero=from_zero, interpret=interpret)


def descend_sweep_cap(restriction: str, err_mode) -> int:
    """Max fused sweeps for the descend kernel: the extra residual sweep
    costs one halo row, the full-weighting ±1-row combine one more."""
    cap = MAX_FUSED_SWEEPS - 1
    if restriction == "full_weighting":
        cap -= 1
    return cap


def _fused_descend_shard_call(offs, u, f, n: int, h: float, steps: int,
                              omega: float, restriction: str, err_mode,
                              ext_r: int, ext_c: int, from_zero: bool,
                              interpret: bool):
    erows, cp = u.shape
    out_rows = erows - 2 * ext_r
    assert out_rows % 16 == 0, (
        f"fused descend needs block rows % 16 == 0, got {out_rows}")
    cap = descend_sweep_cap(restriction, err_mode)
    assert 1 <= steps <= cap, (
        f"fused descend supports 1..{cap} sweeps for "
        f"restriction={restriction!r}, err={err_mode!r}; got {steps}")

    itemsize = jnp.dtype(u.dtype).itemsize
    strip, pw, powned, lh, num_panels = _descend_geometry(
        erows, cp, ext_c, itemsize)
    if strip >= erows:
        strip, owned, num_strips = erows, out_rows, 1
    else:
        owned = strip - 2 * HALO            # strip ×16 ⇒ owned ×16
        num_strips = math.ceil(out_rows / owned)
    assert owned % 16 == 0

    kernel = partial(_fused_descend_kernel, n=n, erows=erows, cp=cp,
                     out_rows=out_rows, ext_r=ext_r, ext_c=ext_c, steps=steps,
                     num_strips=num_strips, strip=strip, owned=owned,
                     h2=h * h, omega=omega, from_zero=from_zero,
                     restriction=restriction,
                     pw=pw, powned=powned, lh=lh, num_panels=num_panels,
                     err_mode=err_mode)

    oc = owned // 2
    out_cols = cp - 2 * ext_c
    out_shape = [jax.ShapeDtypeStruct((out_rows, out_cols), u.dtype),
                 jax.ShapeDtypeStruct((out_rows // 2, out_cols), u.dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    if err_mode is not None:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    result = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((2, strip, pw), u.dtype),   # u load slots
            pltpu.VMEM((2, strip, pw), u.dtype),   # f load slots -> C coeff
            pltpu.VMEM((strip, pw), u.dtype),      # ping-pong work buffer
            pltpu.VMEM((strip, pw), u.dtype),      # A coefficient
            pltpu.VMEM((strip, pw), u.dtype),      # restriction staging
            pltpu.VMEM((2, oc, pw), u.dtype),      # decimated out slots
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET_BYTES),
        interpret=interpret,
    )(offs, u, f)
    u_new, dwide = result[0], result[1]
    if err_mode is None:
        return u_new, dwide, None
    raw = result[2][0, 0]
    npts = n * n
    if err_mode == "gpu":
        scale = 4.0 / (h * h) / npts
    else:
        scale = (4.0 / (omega * h * h) / npts
                 * (2.0 if err_mode == "cpu" else 1.0))
    # raw partials are f32 (bf16 has no scalar add and no usable range);
    # rescale in f32, present in the state dtype
    err = (raw * jnp.float32(scale)).astype(u.dtype)
    return u_new, dwide, err


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "compat",
                                   "want_err", "interpret"))
def fused_ascend_padded(u, f, cwide, n: int, h: float, steps: int,
                        omega: float = 1.0, compat=True,
                        want_err: bool = False, interpret: bool = False):
    """The ascend leg fused: 2:1 row-prolongation + interior add + ``steps``
    post-sweeps in ONE HBM pass (see _fused_ascend_kernel). ``cwide`` is the
    lane-expanded coarse solution from ops.padded.prolong_lanes_p, shape
    (rp/2 + 8, cp). Returns (u_new, err) — err None unless ``want_err``.
    """
    _check_padded(u.shape, n)
    err_mode = (None if not want_err
                else "gpu" if compat == "gpu" else "cpu" if compat
                else "clean")
    return _fused_ascend_shard_call(
        jnp.zeros((2,), jnp.int32), u, f, cwide, n, h, steps, omega,
        err_mode, ext_r=0, ext_c=0, interpret=interpret)


def _panel_geometry(erows: int, cp: int, ext_c: int, strip_for,
                    row_halo: int):
    """(strip, pw, powned, lh, num_panels) minimizing redundant work.

    Full-width strips are tiny when a kernel carries many buffers (the
    ascend leg's 3 correction buffers force 48-row strips -> 3x redundant
    compute at 8193^2, measured); lane panels trade a 2x128-lane halo for
    much taller strips. ``strip_for(pw)`` is the kernel's VMEM-budget strip
    height at panel width pw; ``row_halo`` the rows lost to row halos.
    Panels need ext_c == 0 and enough width to amortize the halo.
    """
    best = (cp, cp, 0, 1)           # pw, powned, lh, num_panels
    best_cost = None
    if ext_c == 0 and cp >= 4096:
        for powned in range(1024, cp + 1, LANE):
            npan = -(-cp // powned)
            pw_c = cp if npan == 1 else powned + 2 * LANE
            if pw_c > cp:
                continue
            strip = strip_for(pw_c)
            out_eff = strip - row_halo
            if strip >= erows:
                row_ov = 1.0
            elif out_eff <= 0:
                continue
            else:
                row_ov = strip / out_eff
            cost = (npan * pw_c / cp) * row_ov
            if best_cost is None or cost < best_cost - 1e-9:
                best_cost = cost
                best = (pw_c, powned if npan > 1 else cp,
                        LANE if npan > 1 else 0, npan)
    pw, powned, lh, npan = best
    strip = min(strip_for(pw), erows)
    return strip, pw, powned, lh, npan


def _ascend_geometry(erows: int, cp: int, ext_c: int, itemsize: int):
    def strip_for(pw):
        # 2u + 2f + work + A (6 strips) + 2 half-height cw slots (strip + 16)
        r_budget = _VMEM_BUDGET_BYTES // (pw * itemsize)
        strip = ((r_budget - 16) // 7 // 16) * 16
        return max(6 * HALO, min(strip, 1024, (erows // 16) * 16 or 16))

    return _panel_geometry(erows, cp, ext_c, strip_for, 4 * HALO)


def _descend_geometry(erows: int, cp: int, ext_c: int, itemsize: int):
    def strip_for(pw):
        # 2u + 2f + work + A + dec_scr (7 strips) + 2 half-height dec_out
        r_budget = _VMEM_BUDGET_BYTES // (pw * itemsize)
        strip = (r_budget // 8 // 16) * 16
        return max(4 * HALO, min(strip, 1024, (erows // 16) * 16 or 16))

    return _panel_geometry(erows, cp, ext_c, strip_for, 2 * HALO)


def _fused_ascend_shard_call(offs, u, f, cwide, n: int, h: float, steps: int,
                             omega: float, err_mode, ext_r: int, ext_c: int,
                             interpret: bool):
    erows, cp = u.shape
    out_rows = erows - 2 * ext_r
    assert out_rows % 16 == 0 and (ext_r % 16 == 0)
    assert cwide.shape == (erows // 2 + 8, cp), (
        f"cwide must be {(erows // 2 + 8, cp)}, got {cwide.shape}")
    cap = MAX_FUSED_SWEEPS if err_mode in (None, "gpu") else MAX_FUSED_SWEEPS - 1
    assert 1 <= steps <= cap, (
        f"fused ascend supports 1..{cap} sweeps (err={err_mode!r}), got {steps}")

    itemsize = jnp.dtype(u.dtype).itemsize
    strip, pw, powned, lh, num_panels = _ascend_geometry(
        erows, cp, ext_c, itemsize)
    if strip >= erows:
        strip, owned, num_strips = erows, out_rows, 1
    else:
        owned = strip - 4 * HALO          # 16-row halo each side (see kernel)
        num_strips = math.ceil(out_rows / owned)
    assert strip % 16 == 0 and owned % 16 == 0
    cwrows = strip // 2 + 8

    kernel = partial(_fused_ascend_kernel, n=n, erows=erows, cp=cp,
                     out_rows=out_rows, ext_r=ext_r, ext_c=ext_c, steps=steps,
                     num_strips=num_strips, strip=strip, owned=owned,
                     cwrows=cwrows, h2=h * h, omega=omega,
                     pw=pw, powned=powned, lh=lh, num_panels=num_panels,
                     err_mode=err_mode)

    out_shape = [jax.ShapeDtypeStruct((out_rows, cp - 2 * ext_c), u.dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if err_mode is not None:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    result = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((2, strip, pw), u.dtype),       # u load slots
            pltpu.VMEM((2, strip, pw), u.dtype),       # f load slots -> C
            pltpu.VMEM((2, cwrows, pw), u.dtype),      # coarse-wide slots
            pltpu.VMEM((strip, pw), u.dtype),          # ping-pong work
            pltpu.VMEM((strip, pw), u.dtype),          # A coefficient
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * _VMEM_BUDGET_BYTES),
        interpret=interpret,
    )(offs, u, f, cwide)
    if err_mode is None:
        return result[0], None
    u_new, raw = result[0], result[1][0, 0]
    npts = n * n
    if err_mode == "gpu":
        scale = 4.0 / (h * h) / npts
    else:
        scale = (4.0 / (omega * h * h) / npts
                 * (2.0 if err_mode == "cpu" else 1.0))
    # raw partials are f32 (bf16 has no scalar add and no usable range);
    # rescale in f32, present in the state dtype
    err = (raw * jnp.float32(scale)).astype(u.dtype)
    return u_new, err


@partial(jax.jit, static_argnames=("n", "h", "negate", "interpret"))
def residual_pallas(u, f, n: int, h: float, negate: bool = False,
                    interpret: bool = False):
    """Pallas 5-point residual on the padded layout; matches
    ops.padded.residual_p (getResidual, MG_solver_CPU.cpp:554-564)."""
    _check_padded(u.shape, n)
    return _residual_shard_call(jnp.zeros((2,), jnp.int32), u, f, n, h,
                                negate, ext_r=0, interpret=interpret)


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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (nwords + 1),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "compat",
                                   "from_zero", "interpret"))
def fused_jacobi_err_padded(u, f, n: int, h: float, steps: int,
                            omega: float = 1.0, compat=True,
                            from_zero: bool = False,
                            interpret: bool = False):
    """``steps`` sweeps WITH the smoothing-error metric fused into the same
    HBM pass — the TPU form of ker_Smoothing_GPU's in-kernel block reduction
    (MG_solver_GPU.cu:584-661). Returns (u, err).

    ``compat`` selects the metric exactly like stencils.smooth: True (the
    CPU color-bugged sum), False (clean mean |residual|), "gpu" (|ΔU|·4/h²
    of the final sweep). Semantically identical to fused_jacobi_padded +
    smoothing_error_p / gpu_smoothing_error_p, but the error pass costs zero
    extra HBM traffic — trigger-mode sweeps drop from ~5 to 3 passes each.
    """
    _check_padded(u.shape, n)
    if steps <= 0:
        return u, jnp.zeros((), u.dtype)
    err_mode = "gpu" if compat == "gpu" else ("cpu" if compat else "clean")
    # the cpu/clean extra in-VMEM residual sweep consumes one halo row, so
    # the final (error-emitting) pass fuses at most 7 sweeps
    last_cap = MAX_FUSED_SWEEPS if err_mode == "gpu" else MAX_FUSED_SWEEPS - 1
    last = min(steps, last_cap)
    first = True
    if steps > last:
        u = fused_jacobi_padded(u, f, n, h, steps - last, omega,
                                from_zero=from_zero, interpret=interpret)
        first = False
    u, raw = _fused_jacobi_shard_call(
        jnp.zeros((2,), jnp.int32), u, f, n, h, last, omega, ext_r=0,
        from_zero=from_zero and first, interpret=interpret,
        err_mode=err_mode)
    npts = n * n
    if err_mode == "gpu":
        scale = 4.0 / (h * h) / npts
    else:
        scale = (4.0 / (omega * h * h) / npts
                 * (2.0 if err_mode == "cpu" else 1.0))
    # raw partials are f32 (bf16 has no scalar add and no usable range);
    # rescale in f32, present in the state dtype
    err = (raw * jnp.float32(scale)).astype(u.dtype)
    return u, err


def fused_rbgs_padded(u: jnp.ndarray, f: jnp.ndarray, n: int, h: float,
                      steps: int, from_zero: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """``steps`` red-black Gauss-Seidel sweeps on padded-layout arrays,
    ≤4 per HBM pass (each sweep is two colored half-updates and consumes two
    trapezoid halo rows).

    Semantically identical to ``steps`` applications of
    ops.padded.redblack_gs_sweep_p / ops.stencils.redblack_gs_sweep (the
    reference's GaussSeidel inner loop, MG_solver_CPU.cpp:996-1055, and its
    paired GPU kernels ker_GaussSeideleven/odd_GPU,
    MG_solver_GPU.cu:663-795). Chunks calls when steps > 4.

    ``from_zero=True`` (correction levels): skips the u read of the first
    pass — no closed-form shortcut exists for GS (the odd half reads fresh
    even values), so all sweeps still run.
    """
    if steps <= 0:
        return u
    first = True
    while steps > 0:
        k = min(steps, MAX_FUSED_RBGS)
        u = _fused_jacobi_call(u, f, n, h, k, 1.0, from_zero and first,
                               interpret, smoother="rbgs")
        steps -= k
        first = False
    return u


@partial(jax.jit, static_argnames=("n", "h", "steps", "compat", "from_zero",
                                   "interpret"))
def fused_rbgs_err_padded(u, f, n: int, h: float, steps: int, compat=True,
                          from_zero: bool = False, interpret: bool = False):
    """``steps`` rb-GS sweeps WITH the cpu/clean smoothing-error metric fused
    into the final HBM pass (one extra in-VMEM ω=1 Jacobi delta = (h²/4)·r
    of the final iterate). Returns (u, err); matches fused_rbgs_padded +
    smoothing_error_p to fp32 reassociation tolerance. The gpu metric needs
    the final full-sweep ping-pong pair, which the in-place color halves
    destroy — callers route compat="gpu" through the two-call form.
    """
    _check_padded(u.shape, n)
    assert compat != "gpu", "rbgs fuses only the cpu/clean error metrics"
    if steps <= 0:
        return u, jnp.zeros((), u.dtype)
    err_mode = "cpu" if compat else "clean"
    # 2·last + 1 halo rows (the extra residual half) must fit HALO
    last = min(steps, (HALO - 1) // 2)
    first = True
    if steps > last:
        u = fused_rbgs_padded(u, f, n, h, steps - last,
                              from_zero=from_zero, interpret=interpret)
        first = False
    u, raw = _fused_jacobi_shard_call(
        jnp.zeros((2,), jnp.int32), u, f, n, h, last, 1.0, ext_r=0,
        from_zero=from_zero and first, interpret=interpret,
        err_mode=err_mode, smoother="rbgs")
    npts = n * n
    scale = 4.0 / (h * h) / npts * (2.0 if err_mode == "cpu" else 1.0)
    err = (raw * jnp.float32(scale)).astype(u.dtype)
    return u, err


def errs_sweep_cap(compat) -> int:
    """Max sweeps per fused_jacobi_errs_padded pass (trapezoid budget)."""
    return MAX_FUSED_SWEEPS if compat == "gpu" else MAX_FUSED_SWEEPS - 1


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "compat",
                                   "interpret"))
def fused_jacobi_errs_padded(u, f, n: int, h: float, steps: int,
                             omega: float = 1.0, compat=True,
                             interpret: bool = False):
    """``steps`` sweeps emitting the smoothing-error metric of EVERY iterate
    u_1..u_steps in the same HBM pass — the trigger-batching kernel.

    Returns (u_new, errs) with ``errs`` shape (steps,): errs[s-1] is exactly
    the metric fused_jacobi_err_padded would report after s sweeps (same
    compat semantics). The per-iterate values cost only in-VMEM arithmetic:
    Δ_{s+1} = u_{s+1} − u_s equals (ω/4)h²·r(u_s), so the cpu/clean metric of
    u_s falls out of sweep s+1 and the gpu metric out of sweep s itself.

    Used by the batched trigger mode (SolverConfig.trigger_batch > 1): one
    HBM pass per ``steps`` trigger sweeps instead of one pass per sweep, at
    the cost of overshooting the reference's stop point by up to steps − 1
    sweeps (semantics divergence — callers gate it behind the flag).
    """
    _check_padded(u.shape, n)
    err_mode = "gpu" if compat == "gpu" else ("cpu" if compat else "clean")
    assert 1 <= steps <= errs_sweep_cap(compat)
    u, raw = _fused_jacobi_shard_call(
        jnp.zeros((2,), jnp.int32), u, f, n, h, steps, omega, ext_r=0,
        from_zero=False, interpret=interpret, err_mode=err_mode,
        per_sweep=True)
    npts = n * n
    if err_mode == "gpu":
        scale = 4.0 / (h * h) / npts
    else:
        scale = (4.0 / (omega * h * h) / npts
                 * (2.0 if err_mode == "cpu" else 1.0))
    # raw partials are f32 (bf16 has no scalar add and no usable range);
    # rescale in f32, present in the state dtype
    errs = (raw * jnp.float32(scale)).astype(u.dtype)
    return u, errs

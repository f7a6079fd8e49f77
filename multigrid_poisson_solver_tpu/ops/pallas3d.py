"""Pallas TPU kernels for the 3-D hot path (capability beyond the 2-D
reference — see models.poisson3d for the oracle ops and the V-cycle).

The 2-D strip architecture (ops.pallas_kernels) generalizes to 3-D as
(z, row)-BRICK streaming: the (nz, rp, cp) padded volume is cut into bricks
of ``zs`` z-planes x ``rs`` rows x full lanes. Each brick is DMA'd into VMEM
once with a ``steps``-plane z-halo and an 8-row r-halo (trapezoidal tiling
in two dimensions), k <= 8 sweeps of the 7-point stencil run on-chip
ping-ponging two VMEM bricks, and only the owned (oz x orow) core is written
back. HBM traffic drops from 12 bytes/point/sweep to ~12·overhead/k, and —
as in 2-D — the kernel sidesteps XLA's slow roll/slice lowerings.

Trapezoid correctness (two dimensions now): after sweep s, planes within
(k - s) of a brick z-cut and rows within (k - s) of a brick r-cut are stale;
owned cores sit >= k planes / >= 8 >= k rows from any cut, and true Dirichlet
faces anchor themselves (never updated). The z-halo is exactly ``steps``
planes (the leading dim is untiled, so offsets need no alignment); the
r-halo stays 8 for Mosaic's x8 sliced-DMA alignment.

Masks follow the 2-D scheme: a per-brick 2-D coefficient plane
A = mask·omega/6 freezes cut rows/cols + Dirichlet + padding, and each local
plane t gets a traced scalar gate for the z-Dirichlet faces.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import pad_cols_to, pad_rows_to
from .pallas_kernels import _i32, _mul8, _nb_sum, _wrap_shift

MAX_FUSED_SWEEPS_3D = 8

# 3-D bricks want a large slice of the 128 MiB VMEM: small budgets force
# tiny bricks whose 2-D trapezoid halos cost ~5x redundant compute at k=8
# (513³ geometry: red 4.91x at 13 MiB vs 1.93x at 48 MiB). Hardware budget
# sweep at 513³ k=8, replicated with reps=4 differential AND a 5-pass
# carry-chained jit loop (2026-08-17, later session): 13 MiB ~6.6 ms/sweep,
# 48 MiB 2.6-3.0, **56-96 MiB plateau at 1.94-2.25 ms/sweep (~65 GDoF/s)**
# — 64 MiB default. (An earlier same-day reps=2 measurement recorded
# 0.98 ms/sweep @48 MiB; it does not replicate under any protocol — the
# 0.64 s tunnel-sync noise swamps reps=2 differentials at this kernel size.)
_VMEM_BUDGET_3D_BYTES = int(
    os.environ.get("MG_VMEM_BUDGET_3D", 64 * 1024 * 1024))

# The fused descend/ascend legs keep improving past the smoother's sweet
# spot (hardware sweep 2026-08-17: descend 11.4 ms @48 MiB → 7.8-8.4 @96-112;
# ascend flat ~11.4) — they get their own, larger default budget.
_VMEM_BUDGET_3D_LEGS_BYTES = int(
    os.environ.get("MG_VMEM_BUDGET_3D_LEGS", 96 * 1024 * 1024))


def _vmem_limit(scratch_bytes: int) -> int:
    """Mosaic allocation cap for a pallas_call: the actual resident scratch
    + headroom for plane-sized sweep temporaries, under the 128 MiB part.
    Computed per call from the chosen brick geometry — a static cap tied to
    the import-time budget silently under-allocates when the budget is
    overridden (the round-2 48+ MiB 'compile failures')."""
    return min(scratch_bytes + 16 * 1024 * 1024, 126 * 1024 * 1024)

# Sweep lowering: per-z-plane (rs, cp) ops driven by an in-kernel
# lax.fori_loop with dynamic leading-dim VMEM indexing. A whole-brick
# concat-shift variant ("brick" mode) was A/B'd on hardware at 513³ k=8
# (13.6 MiB budget): planes 3.45 ms/sweep vs brick 3.81, and brick
# temporaries are brick-sized (VMEM hazard at large budgets) — removed.
# The plane loop is a fori_loop (not a Python unroll) so Mosaic program
# size is O(1) in brick depth; unrolled kernels crashed the compiler for
# zs ≳ 30 (the 48+ MiB budget failures in the round-2 sweep).
#
# Plane-read form (perf knob, trace-time): "reread" reads 3 planes from
# VMEM per updated plane (t−1, t, t+1 each sweep); "carry" threads
# (u_{t−1}, u_t) through the fori carry so each plane is READ ONCE per
# sweep — same expressions and order, bit-identical by construction.
# MEASURED on hardware (2026-08-20, examples/exp_sweep3_carry.py, 513³
# k=8 chained): carry 2.530 ms/sweep vs reread 2.217 — Mosaic
# materializes the carry shuffles as plane copies, giving the read
# saving back with interest (outputs maxdiff 0.0).
#
# MULTI-OUTPUT-PLANE BLOCKING ("pair"/"quad"/"oct"/"blkN"): update B
# planes per fori iteration, loading planes t−1..t+B once — (B+2)/B loads
# per update vs 3, no carry threading, per-plane expressions/order
# identical to reread (bit-identical on HW). MEASURED 513³ k=8 chained
# (2026-08-20, examples/exp_sweep3_block.py, maxdiff 0.0 all forms):
#   reread 2.217 ms/sweep | pair 1.944 | quad 1.758 | oct 1.678 (1.32×)
#   | blk16 1.643 (+2% over oct at 2× the compile time and a ≤15-plane
#   statically-unrolled tail — not worth it; oct's tail is ≤7)
# "oct" is the default: ~80 GDoF/s, closing most of the 3-VMEM-read gap
# vs the 2-D kernel's VPU efficiency.
_SWEEP3_FORM = os.environ.get("MG_SWEEP3_FORM", "oct")
# Partial plane-loop unroll was probed (2026-08-20) and is NOT a lever:
# Mosaic's for-loop lowering supports only unroll=1 or FULL unroll
# ("Only unroll=num_steps and unroll=1 supported"), and full unroll is the
# known compiler-killer past ~30 planes.


def _sweep_blk() -> int:
    """Output-plane block size of the current _SWEEP3_FORM (1 = no
    blocking: reread/carry)."""
    if _SWEEP3_FORM in ("reread", "carry"):
        return 1
    b = {"pair": 2, "quad": 4, "oct": 8}.get(_SWEEP3_FORM, None)
    if b is None:
        assert _SWEEP3_FORM.startswith("blk"), _SWEEP3_FORM
        b = int(_SWEEP3_FORM[3:])
    return b


def _plane_sweep(rd, wr_, ab, fc, zs: int, rs: int, cp: int):
    """One Jacobi sweep over the brick interior: u' = u + A·(Σnb − 6u) − C.

    ``rd(t)``/``wr_(t, v)`` read/write plane t of the ping-pong pair;
    ``ab(t)``/``fc(t)`` read the coefficient and folded-source planes.
    Cut/face planes (0, zs−1) copy through so the destination buffer holds
    valid halos for the next sweep. The interior loop form is selected by
    ``_SWEEP3_FORM`` (module comment above) — every form produces
    bit-identical planes (same expressions, same order)."""
    wr_(_i32(0), rd(_i32(0)))
    wr_(_i32(zs - 1), rd(_i32(zs - 1)))

    def upd(t, u, um, up):
        nb = (_nb_sum(u, rs, cp) + um + up - 6.0 * u)
        wr_(t, u + ab(t) * nb - fc(t))

    if _SWEEP3_FORM == "carry":
        def plane(t, c):
            um, u = c
            up = rd(t + 1)
            upd(t, u, um, up)
            return (u, up)

        jax.lax.fori_loop(_i32(1), _i32(zs - 1), plane,
                          (rd(_i32(0)), rd(_i32(1))), unroll=False)
    elif _SWEEP3_FORM != "reread":
        blk = _sweep_blk()
        nblk = (zs - 2) // blk

        def plane_blk(i, c):
            t = _i32(1) + _i32(blk) * _i32(i)
            us = [rd(t + _i32(d)) for d in range(-1, blk + 1)]
            for d in range(blk):
                upd(t + _i32(d), us[d + 1], us[d], us[d + 2])
            return c

        jax.lax.fori_loop(_i32(0), _i32(nblk), plane_blk, _i32(0),
                          unroll=False)
        # static tail: < blk leftover interior planes, reread form
        for t_ in range(1 + nblk * blk, zs - 1):
            t = _i32(t_)
            upd(t, rd(t), rd(t - 1), rd(t + 1))
    else:
        def plane(t, c):
            u = rd(t)
            upd(t, u, rd(t - 1), rd(t + 1))
            return c

        jax.lax.fori_loop(_i32(1), _i32(zs - 1), plane, _i32(0),
                          unroll=False)


def padded_shape3(n: int) -> tuple[int, int, int]:
    """(nz, rp, cp) for an (n, n, n) grid: z unpadded (untiled leading dim),
    rows x8, lanes x128."""
    return (n, pad_rows_to(n), pad_cols_to(n))


def pad_grid3(a: jnp.ndarray) -> jnp.ndarray:
    n = a.shape[0]
    nz, rp, cp = padded_shape3(n)
    return jnp.pad(a, ((0, 0), (0, rp - n), (0, cp - n)))


def unpad_grid3(a: jnp.ndarray, n: int) -> jnp.ndarray:
    return a[:n, :n, :n]


def _brick_geometry(nz: int, rp: int, cp: int, itemsize: int, z_halo: int,
                    num_bufs: float = 5.0, orow_mult: int = 8,
                    oz_even: bool = False, r_halo: int = 8,
                    zs_even: bool = False, budget: int | None = None):
    """(zs, rs) minimizing redundant compute under the VMEM budget.

    Resident: 2 u slots + 2 f slots + 1 work brick (~5 bricks) + one 2-D
    coefficient plane (counted via num_bufs headroom).

    ``orow_mult=16`` / ``oz_even=True`` force 2:1-decimation-friendly write
    windows (the fused descend leg halves rows and planes in-kernel: row
    windows must start on even GLOBAL rows — wr multiples of 16 with rp ×16
    — and z windows on even planes except the final clipped one, which the
    coarse-window arithmetic absorbs). The fused ascend leg instead needs
    ``r_halo=16`` (so LOAD offsets r0 stay ×16 and the coarse-row DMA
    window r0/2 is provably ×8) and ``zs_even=True`` (the coarse z window
    zs//2 + 1 covers both interpolation taps of every loaded plane only
    for even zs)."""
    if budget is None:
        budget = _VMEM_BUDGET_3D_BYTES
    best = None
    r_lo = max(3 * r_halo, 2 * orow_mult)
    for rs in range(r_lo, min(rp, 512) + 1, 8):
        if rs < rp and (rs - 2 * r_halo) % orow_mult:
            continue
        zs = int(budget // (num_bufs * rs * cp * itemsize))
        # plane loops are fori_loops, so program size is O(1) in zs — no
        # compile-time cap needed; the cost model picks the (zs, rs) shape
        zs = min(zs, nz)
        if rs >= rp:
            orow = rp
        else:
            orow = rs - 2 * r_halo
        if zs >= nz:
            oz = nz
        else:
            if zs_even and zs % 2:
                zs -= 1
            oz = zs - 2 * z_halo
            if oz_even and oz % 2:
                zs -= 1
                oz -= 1
        if oz < 1 or orow < 8:
            continue
        cost = (zs * rs) / (oz * orow)
        if best is None or cost < best[0] - 1e-9:
            best = (cost, zs, rs, oz, orow)
    if best is None:
        raise ValueError(
            f"no 3-D brick fits VMEM for rp={rp} cp={cp} (grid too wide)")
    _, zs, rs, oz, orow = best
    return zs, rs, oz, orow


def _fused_jacobi3_kernel(offs_smem, u_hbm, f_hbm, *rest,
                          n: int, nz: int, rp: int, cp: int, steps: int,
                          z_halo: int, ext_z: int, out_z: int,
                          zs: int, rs: int, oz: int, orow: int,
                          num_zb: int, num_rb: int,
                          h2: float, omega: float, from_zero: bool,
                          err_mode=None, per_sweep: bool = False,
                          emit_residual: bool = False, negate: bool = False):
    """k fused sweeps of the 7-point stencil over (z, row) bricks.

    Single-device: nz == out_z == the padded volume depth, ext_z = 0 and
    offs_smem = (0,). Sharded (parallel.pallas_shard3): the input volume is
    a z-shard EXTENDED by ext_z freshly-ppermuted halo planes on each side
    (nz = out_z + 2·ext_z), the output is the bare shard, and offs_smem[0]
    holds the GLOBAL z index of extended plane 0 so the z-Dirichlet gates
    stay exact under partitioning. Trapezoid staleness at the extension
    edges is bounded by the same ≤steps-sweep argument as interior brick
    z-cuts.

    ``err_mode`` fuses the smoothing-error reduction into the same HBM pass
    (the 3-D member of the 2-D _fused_jacobi_kernel's err fusion; reference
    analog ker_Smoothing_GPU, MG_solver_GPU.cu:584-661):
      * "clean" — Σ|residual(u_final)| over owned∩interior cells, via one
        EXTRA in-VMEM sweep (Δ = (ω/6)h²·r), zero extra HBM traffic —
        requires the effective sweep count ≤ 7 (the extra sweep consumes
        one halo ring);
      * "gpu"   — Σ|Δu|·6/h² of the final sweep (the GPU reference metric).
    The raw f32 partial (already metric-scaled, divide by n³ outside) lands
    in a (1, 1) SMEM output — or (1, steps) under ``per_sweep`` (trigger
    batching): one metric value per iterate u_1..u_steps, the gpu value of
    u_s captured during sweep s, the clean value of u_s during sweep s+1
    plus one extra in-VMEM residual sweep for the final iterate."""
    n_out = 1 + (1 if emit_residual else 0) + (1 if err_mode else 0)
    if emit_residual:
        out_hbm, r_hbm = rest[:2]
        if err_mode is not None:
            err_smem = rest[2]
    else:
        out_hbm = rest[0]
        if err_mode is not None:
            err_smem = rest[1]
    rest = rest[n_out:]
    if emit_residual:
        (u_slots, fc_slots, work, a_buf, load_sems, out_sems,
         r_sems) = rest
    else:
        u_slots, fc_slots, work, a_buf, load_sems, out_sems = rest
    num_iter = num_zb * num_rb
    w = jnp.asarray(omega / 6.0, u_hbm.dtype)
    zoff = offs_smem[0]

    def zi(idx):
        if num_rb == 1:
            return _i32(idx), _i32(0)
        return _i32(idx) // _i32(num_rb), jax.lax.rem(_i32(idx), _i32(num_rb))

    def write_z(i):
        return jnp.clip(_i32(i) * _i32(oz), _i32(0), _i32(out_z - oz))

    def load_z(i):
        # load start derives from the CLIPPED write start: with ext_z >
        # z_halo (odd-steps ascend, short final multi-pass sweeps) the naive
        # i*oz-based start can sit above the clipped window's halo floor,
        # leaving the first owned plane one ring stale (caught by review,
        # reproduced at oz∤nl multi-brick geometries)
        return jnp.clip(write_z(i) + _i32(ext_z - z_halo), _i32(0),
                        _i32(nz - zs))

    def load_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow) - _i32(8), _i32(0),
                              _i32(rp - rs)))

    def write_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow), _i32(0),
                              _i32(rp - orow)))

    def load_copies(idx, slot):
        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        copies = (pltpu.make_async_copy(
            f_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
            fc_slots.at[slot], load_sems.at[slot, _i32(1)]),)
        if not from_zero:
            copies += (pltpu.make_async_copy(
                u_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
                u_slots.at[slot], load_sems.at[slot, _i32(0)]),)
        return copies

    def out_copy(idx, slot):
        i, j = zi(idx)
        wz, wr = write_z(i), write_r(j)
        zlo = wz + _i32(ext_z) - load_z(i)
        rlo = _mul8(wr - load_r(j))
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(zlo, oz), pl.ds(rlo, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    def r_copy(idx):
        # the residual brick lives in the single ``work`` buffer: at most
        # one r DMA is in flight (the next brick WAITS before its first
        # work write), so one sem slot per parity is enough bookkeeping
        i, j = zi(idx)
        wz, wr = write_z(i), write_r(j)
        zlo = wz + _i32(ext_z) - load_z(i)
        rlo = _mul8(wr - load_r(j))
        return pltpu.make_async_copy(
            work.at[pl.ds(zlo, oz), pl.ds(rlo, orow), :],
            r_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            r_sems.at[jax.lax.rem(_i32(idx), _i32(2))])

    for cp_ in load_copies(0, _i32(0)):
        cp_.start()

    def body(idx, carry):
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

        if emit_residual:
            # the previous brick's residual DMA must drain before this
            # brick's sweeps overwrite the shared work buffer
            @pl.when(idx >= 1)
            def _():
                r_copy(idx - 1).wait()

        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)

        # --- per-brick 2-D coefficient plane (rows x lanes) ----------------
        rows = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows + r0
        ok = ((g >= 1) & (g <= n - 2) & (cols >= 1) & (cols <= n - 2)
              & (rows >= 1) & (rows <= rs - 2))
        a_plane = jnp.where(ok, w, jnp.zeros_like(w)).astype(u_hbm.dtype)
        h2c = jnp.asarray(h2, u_hbm.dtype)

        # A (zero on every frozen cell) and C = A·h²·f, built once per
        # brick. Plane loops are lax.fori_loops with dynamic leading-dim
        # indexing (the leading dim of VMEM scratch is untiled, so traced
        # offsets are unconstrained): program size stays O(1) in zs, which
        # is what lets large-VMEM bricks compile at all — the unrolled form
        # (zs x steps plane statements) killed the compiler past ~30 planes.
        def build_plane(t, c):
            gz = zoff + z0 + t
            # updatable: interior in z AND not a brick z-cut plane
            gate = (gz >= 1) & (gz <= n - 2) & (t > 0) & (t < zs - 1)
            ap = jnp.where(gate, a_plane, jnp.zeros_like(a_plane))
            a_buf[t] = ap
            raw_f = fc_slots[slot, t]
            fc_slots[slot, t] = ap * (h2c * raw_f)
            if from_zero:
                # closed-form first sweep from u≡0: u₁ = −(ω/6)h²f on the
                # GLOBAL interior — including brick/extension cut planes and
                # rows (no neighbor dependence, so u₁ is exact there too;
                # freezing cuts at u₀ = 0 instead would cost one halo ring,
                # exactly the 2-D kernel's ok_global treatment)
                okg = ((g >= 1) & (g <= n - 2)
                       & (cols >= 1) & (cols <= n - 2)
                       & (gz >= 1) & (gz <= n - 2))
                u_slots[slot, t] = jnp.where(
                    okg, -(w * (h2c * raw_f)),
                    jnp.zeros((rs, cp), u_hbm.dtype))
            return c

        jax.lax.fori_loop(_i32(0), _i32(zs), build_plane, _i32(0),
                          unroll=False)

        n_sweeps = steps - 1 if from_zero else steps

        def read_u(t):
            return u_slots[slot, t]

        def write_u(t, v):
            u_slots[slot, t] = v

        def read_w(t):
            return work[t]

        def write_w(t, v):
            work[t] = v

        accessors = [(read_u, write_u), (read_w, write_w)]

        def sweep(rd, wr):
            _plane_sweep(rd, wr, lambda t: a_buf[t],
                         lambda t: fc_slots[slot, t], zs, rs, cp)

        if err_mode is not None:
            # exact (non-overlapping) ownership for the reduction, unlike
            # the harmlessly-overlapping clamped write windows
            own_r = ((g >= _i32(j) * _i32(orow))
                     & (g < jnp.minimum((_i32(j) + 1) * _i32(orow),
                                        _i32(rp)))
                     & (g >= 1) & (g <= n - 2)
                     & (cols >= 1) & (cols <= n - 2))

            def own_mask(t):
                gz = zoff + z0 + t
                o = z0 + t - _i32(ext_z)
                return (own_r & (gz >= 1) & (gz <= n - 2)
                        & (o >= _i32(i) * _i32(oz))
                        & (o < jnp.minimum((_i32(i) + 1) * _i32(oz),
                                           _i32(out_z))))

            def own_sum(val_fn):
                def plane_(t, a2):
                    val = val_fn(t).astype(jnp.float32)
                    return a2 + jnp.sum(jnp.where(own_mask(t), val,
                                                  jnp.zeros_like(val)))

                return jax.lax.fori_loop(_i32(1), _i32(zs - 1), plane_,
                                         jnp.zeros((), jnp.float32),
                                         unroll=False)

            def resid_of(rd):
                # extra in-VMEM sweep: Δ = a·(Σnb − 6u) − C is exactly 0 on
                # frozen cells; |r| = |Δ|·6/(ω·h²)
                def val(t):
                    u = rd(t)
                    nb = (_nb_sum(u, rs, cp) + rd(t - 1) + rd(t + 1)
                          - 6.0 * u)
                    return jnp.abs(a_buf[t] * nb - fc_slots[slot, t])
                return val

            s_clean = abs(6.0 / (omega * h2))
            s_gpu = abs(6.0 / h2)

        if per_sweep:
            # trigger batching: metric-scaled per-iterate partials — the
            # gpu metric of u_s is |Δ_s| (captured during sweep s), the
            # clean metric of u_s is |Δ_{s+1}|·6/(ωh²) (during sweep s+1),
            # plus one extra in-VMEM residual sweep for the final iterate
            parts = list(carry)
            for s in range(1, n_sweeps + 1):
                sweep(accessors[(s - 1) % 2][0], accessors[s % 2][1])
                rd_new = accessors[s % 2][0]
                rd_old = accessors[(s - 1) % 2][0]
                d_sum = own_sum(lambda t, a=rd_new, b=rd_old:
                                jnp.abs(a(t) - b(t)))
                if err_mode == "gpu":
                    parts[s - 1] = parts[s - 1] + d_sum * s_gpu
                elif s >= 2:
                    parts[s - 2] = parts[s - 2] + d_sum * s_clean
            if err_mode != "gpu":
                rd_fin = accessors[n_sweeps % 2][0]
                parts[n_sweeps - 1] = (parts[n_sweeps - 1]
                                       + own_sum(resid_of(rd_fin)) * s_clean)
            part = tuple(parts)
        elif emit_residual:
            for s in range(n_sweeps):
                sweep(accessors[s % 2][0], accessors[(s + 1) % 2][1])
            if n_sweeps % 2 == 1:
                def copy_back_r(t, c):
                    u_slots[slot, t] = work[t]
                    return c
                jax.lax.fori_loop(_i32(0), _i32(zs), copy_back_r, _i32(0),
                                  unroll=False)
            # u is final in u_slots: start its write-back NOW so the DMA
            # overlaps the extra residual sweep below (r_plane never writes
            # u_slots; the descend kernel does the same)
            out_copy(idx, slot).start()
            # the extra in-VMEM sweep
            # writes the (optionally negated) residual volume into work —
            # r = Δ·6/(ωh²), exactly 0 on frozen cells — accumulating the
            # clean error partial in the same pass when requested
            scale_r = jnp.asarray((-1.0 if negate else 1.0)
                                  * 6.0 / (omega * h2), u_hbm.dtype)
            zero_plane = jnp.zeros((rs, cp), u_hbm.dtype)
            work[0] = zero_plane
            work[zs - 1] = zero_plane

            def r_plane(t, a2):
                u = u_slots[slot, t]
                nb = (_nb_sum(u, rs, cp) + u_slots[slot, t - 1]
                      + u_slots[slot, t + 1] - 6.0 * u)
                d = a_buf[t] * nb - fc_slots[slot, t]
                work[t] = scale_r * d
                if err_mode is None:
                    return a2
                val = jnp.abs(d).astype(jnp.float32)
                return a2 + jnp.sum(jnp.where(own_mask(t), val,
                                              jnp.zeros_like(val)))

            p = jax.lax.fori_loop(_i32(1), _i32(zs - 1), r_plane,
                                  jnp.zeros((), jnp.float32), unroll=False)
            part = (carry + p * s_clean) if err_mode is not None else carry
            r_copy(idx).start()
            return part

        else:
            for s in range(n_sweeps):
                sweep(accessors[s % 2][0], accessors[(s + 1) % 2][1])

            part = carry
            if err_mode is not None:
                rd_fin = accessors[n_sweeps % 2][0]
                rd_prev = accessors[(n_sweeps - 1) % 2][0]
                if err_mode == "clean":
                    p = own_sum(resid_of(rd_fin))
                    part = carry + p * s_clean
                else:   # "gpu": |Δu| of the final sweep
                    if from_zero and n_sweeps == 0:
                        def dval(t):
                            return jnp.abs(rd_fin(t))
                    else:
                        def dval(t):
                            return jnp.abs(rd_fin(t) - rd_prev(t))
                    part = carry + own_sum(dval) * s_gpu

        if n_sweeps % 2 == 1:
            def copy_back(t, c):
                u_slots[slot, t] = work[t]
                return c
            jax.lax.fori_loop(_i32(0), _i32(zs), copy_back, _i32(0),
                              unroll=False)

        out_copy(idx, slot).start()
        return part

    acc0 = (tuple(jnp.zeros((), jnp.float32) for _ in range(steps))
            if per_sweep else jnp.zeros((), jnp.float32))
    total = jax.lax.fori_loop(_i32(0), _i32(num_iter), body, acc0,
                              unroll=False)
    if per_sweep:
        for s in range(steps):
            err_smem[0, s] = total[s]
    elif err_mode is not None:
        err_smem[0, 0] = total

    last = num_iter - 1
    if num_iter >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()
    out_copy(_i32(last), _i32(last % 2)).wait()
    if emit_residual:
        r_copy(_i32(last)).wait()


def _fused_jacobi3_shard_call(zoff, u, f, n: int, h: float, steps: int,
                              omega: float, ext_z: int, from_zero: bool,
                              interpret: bool, err_mode=None,
                              per_sweep: bool = False,
                              emit_residual: bool = False,
                              negate: bool = False):
    """One ≤8-sweep fused 3-D pass on a (possibly z-halo-extended) volume.

    ``zoff`` = int32 (1,) GLOBAL z index of u's plane 0; ``ext_z`` halo
    planes on each side are consumed but not written — the output is
    (nz − 2·ext_z, rp, cp). Single-device callers pass zoff = (0,) and
    ext_z = 0 (then nz must be the full padded depth). With ``err_mode``
    ("clean"/"gpu") also returns the raw metric-scaled error partial
    (divide by n³ for the mean); "clean"'s extra in-VMEM residual sweep
    consumes one halo ring, so it needs effective sweeps ≤ 7."""
    nz, rp, cp = u.shape
    assert f.shape == u.shape and f.dtype == u.dtype
    assert 1 <= steps <= MAX_FUSED_SWEEPS_3D
    if per_sweep:
        assert err_mode is not None and not from_zero and not emit_residual
    k_eff = steps - 1 if from_zero else steps
    z_halo = steps
    if err_mode == "clean" or emit_residual:
        assert err_mode in (None, "clean")
        assert k_eff <= 7, (
            f"fused clean error / residual emission needs ≤7 sweeps per "
            f"pass, got {k_eff}")
        # the extra in-VMEM sweep needs one ring past the EFFECTIVE
        # neighbor-reading sweeps (from_zero's closed-form first sweep has
        # no neighbor dependence)
        z_halo = k_eff + 1
    assert ext_z == 0 or z_halo <= ext_z, (steps, err_mode, ext_z)
    out_z = nz - 2 * ext_z
    assert out_z >= 1, (nz, ext_z)

    itemsize = jnp.dtype(u.dtype).itemsize
    # resident: 2 u slots + 2 f slots + work + A brick = 6 bricks
    zs, rs, oz, orow = _brick_geometry(nz, rp, cp, itemsize, z_halo=z_halo,
                                       num_bufs=6.0)
    oz = out_z if zs >= nz else min(oz, out_z)
    num_zb = math.ceil(out_z / oz) if zs < nz else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1

    kernel = partial(_fused_jacobi3_kernel, n=n, nz=nz, rp=rp, cp=cp,
                     steps=steps, z_halo=z_halo, ext_z=ext_z, out_z=out_z,
                     zs=zs, rs=rs, oz=oz, orow=orow,
                     num_zb=num_zb, num_rb=num_rb, h2=h * h, omega=omega,
                     from_zero=from_zero, err_mode=err_mode,
                     per_sweep=per_sweep, emit_residual=emit_residual,
                     negate=negate)

    err_cols = steps if per_sweep else 1
    out_shape = [jax.ShapeDtypeStruct((out_z, rp, cp), u.dtype)]
    out_spec = [pl.BlockSpec(memory_space=pl.ANY)]
    if emit_residual:
        out_shape.append(jax.ShapeDtypeStruct((out_z, rp, cp), u.dtype))
        out_spec.append(pl.BlockSpec(memory_space=pl.ANY))
    if err_mode is not None:
        out_shape.append(jax.ShapeDtypeStruct((1, err_cols), jnp.float32))
        out_spec.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    single = len(out_shape) == 1

    scratch = [
        pltpu.VMEM((2, zs, rs, cp), u.dtype),     # u slots
        pltpu.VMEM((2, zs, rs, cp), u.dtype),     # f slots -> C
        pltpu.VMEM((zs, rs, cp), u.dtype),        # ping-pong work
        pltpu.VMEM((zs, rs, cp), u.dtype),        # A coefficient brick
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if emit_residual:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))   # r DMA sems

    result = pl.pallas_call(
        kernel,
        out_shape=out_shape[0] if single else tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec[0] if single else tuple(out_spec),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(6 * zs * rs * cp * itemsize)),
        interpret=interpret,
    )(zoff, u, f)
    if per_sweep:
        return result[0], result[1][0, :]
    if emit_residual and err_mode is not None:
        return result[0], result[1], result[2][0, 0]
    if emit_residual:
        return result[0], result[1]
    if err_mode is not None:
        return result[0], result[1][0, 0]
    return result


def fused_jacobi3_residual_padded(u, f, n: int, h: float, steps: int,
                                  omega: float = 6.0 / 7.0,
                                  from_zero: bool = False,
                                  negate: bool = False,
                                  interpret: bool = False, err_mode=None):
    """``steps`` fused sweeps AND the residual volume of the final iterate
    in ONE HBM pass: r = Δ·6/(ωh²) from the extra in-VMEM sweep (exactly 0
    on Dirichlet/padding cells), optionally negated — "descend minus the
    restriction", for non-2:1 transfers and the z-sharded cycle where the
    separate residual pass would re-read u and f. Returns (u, r) or, with
    ``err_mode="clean"``, (u, r, raw_err). Needs effective sweeps ≤ 7."""
    assert u.shape == padded_shape3(n), (u.shape, padded_shape3(n))
    return _fused_jacobi3_shard_call(
        jnp.zeros((1,), jnp.int32), u, f, n, h, steps, omega, ext_z=0,
        from_zero=from_zero, interpret=interpret, err_mode=err_mode,
        emit_residual=True, negate=negate)


def errs3_sweep_cap(compat) -> int:
    """Max sweeps per fused_jacobi3_errs_padded pass (trapezoid budget:
    the clean metric's extra in-VMEM residual sweep consumes one ring)."""
    return MAX_FUSED_SWEEPS_3D if compat == "gpu" else MAX_FUSED_SWEEPS_3D - 1


def fused_jacobi3_errs_padded(u, f, n: int, h: float, steps: int,
                              omega: float = 6.0 / 7.0, compat="clean",
                              interpret: bool = False):
    """``steps`` 3-D sweeps emitting the smoothing-error metric of EVERY
    iterate u_1..u_steps in one HBM pass — the 3-D trigger-batching kernel
    (2-D analog: pallas_kernels.fused_jacobi_errs_padded). Returns
    (u_new, errs) with errs[s−1] exactly the metric a single-sweep
    err_mode pass would report after s sweeps."""
    assert u.shape == padded_shape3(n), (u.shape, padded_shape3(n))
    mode = "gpu" if compat == "gpu" else "clean"
    assert 1 <= steps <= errs3_sweep_cap(compat)
    u, raw = _fused_jacobi3_shard_call(
        jnp.zeros((1,), jnp.int32), u, f, n, h, steps, omega, ext_z=0,
        from_zero=False, interpret=interpret, err_mode=mode, per_sweep=True)
    # the kernel already applies the metric scaling; normalize to the mean
    errs = (raw / jnp.float32(n) ** 3).astype(u.dtype)
    return u, errs


def fused_jacobi3_padded(u, f, n: int, h: float, steps: int,
                         omega: float = 6.0 / 7.0, from_zero: bool = False,
                         interpret: bool = False, err_mode=None):
    """``steps`` fused 3-D Jacobi sweeps in one HBM pass over the padded
    volume (see module docstring). ``from_zero`` skips the u stream and
    folds the closed-form first sweep (correction levels). With
    ``err_mode`` ("clean"/"gpu") returns (u, raw_err) with the smoothing
    error fused into the same pass (see _fused_jacobi3_shard_call)."""
    assert u.shape == padded_shape3(n), (u.shape, padded_shape3(n))
    return _fused_jacobi3_shard_call(
        jnp.zeros((1,), jnp.int32), u, f, n, h, steps, omega,
        ext_z=0, from_zero=from_zero, interpret=interpret,
        err_mode=err_mode)


# Descend sweep caps: the 8-row halo must absorb k neighbor-reading sweeps
# + 1 residual ring + 1 full-weighting ring (sampling skips the FW ring).
MAX_DESCEND3_SWEEPS_FW = 6
MAX_DESCEND3_SWEEPS_SAMPLING = 7


def _fused_descend3_kernel(offs_smem, u_hbm, f_hbm, out_hbm, dw_hbm,
                           err_smem,
                           u_slots, fc_slots, work, a_buf, dec_scr, dec_out,
                           load_sems, out_sems, dw_sems, *,
                           n: int, nz: int, rp: int, cp: int, steps: int,
                           z_halo: int, ext_z: int, out_z: int,
                           zs: int, rs: int, oz: int, orow: int,
                           num_zb: int, num_rb: int, ozc: int,
                           h2: float, omega: float, from_zero: bool,
                           fw: bool):
    """The WHOLE 3-D descend leg in one HBM pass: k Jacobi sweeps + residual
    + z/row full weighting + z/row decimation (+ the fused clean-metric
    error partial).

    The 3-D member of the 2-D _fused_descend_kernel family (reference leg:
    smooth → getResidual → doRestriction, MG_solver_CPU.cpp:574-680, three
    kernel launches in the GPU version). The residual of the final iterate
    is one EXTRA in-VMEM sweep (Δ = (ω/6)(Σnb − 6u − h²f) ⇒ r = 6Δ/(ωh²)),
    never touching HBM. Full weighting runs [¼,½,¼] in z (3-plane combine
    per COARSE plane), rows and lanes in-kernel; z decimation is the coarse
    plane loop itself and row decimation the sublane-split reshape. Lane
    decimation (1-tap even take) is the caller's cheap quarter-volume XLA
    pass — Mosaic has no lane de-interleave.

    Alignment: orow ×16 and rp ×16 make every row write window start on an
    even global row (coarse windows ×8 for the dwide DMA); oz is even, and
    the one clipped (odd-start) final z window is absorbed by the coarse
    window rule zc0 = (wz+1)//2 — coarse windows then tile [0, m) exactly,
    with one plane of benign duplicate-value overlap.

    Sharded (parallel.pallas_shard3): like _fused_jacobi3_kernel, the input
    is a z-shard extended by ext_z halo planes (offs_smem[0] = GLOBAL z of
    plane 0); the shard's plane count out_z and the shard's GLOBAL start
    Z = offs_smem[0] + ext_z must both be EVEN, so every local coarse-window
    formula keeps global parity unchanged and dw_hbm is the shard's local
    (out_z//2, rp//2, cp) block."""
    num_iter = num_zb * num_rb
    m = (n + 1) // 2
    orc = orow // 2
    w = jnp.asarray(omega / 6.0, u_hbm.dtype)
    zoff = offs_smem[0]
    zc_off = (zoff + _i32(ext_z)) // _i32(2)   # global coarse of dw plane 0

    def zi(idx):
        if num_rb == 1:
            return _i32(idx), _i32(0)
        return _i32(idx) // _i32(num_rb), jax.lax.rem(_i32(idx), _i32(num_rb))

    def write_z(i):
        return jnp.clip(_i32(i) * _i32(oz), _i32(0), _i32(out_z - oz))

    def load_z(i):
        # load start derives from the CLIPPED write start: with ext_z >
        # z_halo (odd-steps ascend, short final multi-pass sweeps) the naive
        # i*oz-based start can sit above the clipped window's halo floor,
        # leaving the first owned plane one ring stale (caught by review,
        # reproduced at oz∤nl multi-brick geometries)
        return jnp.clip(write_z(i) + _i32(ext_z - z_halo), _i32(0),
                        _i32(nz - zs))

    def load_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow) - _i32(8), _i32(0),
                              _i32(rp - rs)))

    def write_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow), _i32(0),
                              _i32(rp - orow)))

    def load_copies(idx, slot):
        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        copies = (pltpu.make_async_copy(
            f_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
            fc_slots.at[slot], load_sems.at[slot, _i32(1)]),)
        if not from_zero:
            copies += (pltpu.make_async_copy(
                u_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
                u_slots.at[slot], load_sems.at[slot, _i32(0)]),)
        return copies

    def out_copy(idx, slot):
        i, j = zi(idx)
        wz, wr = write_z(i), write_r(j)
        zlo = wz + _i32(ext_z) - load_z(i)
        rlo = _mul8(wr - load_r(j))
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(zlo, oz), pl.ds(rlo, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    def dw_copy(idx, slot):
        i, j = zi(idx)
        zc0 = (write_z(i) + _i32(1)) // _i32(2)
        cwr = _mul8(write_r(j) // _i32(2))
        return pltpu.make_async_copy(
            dec_out.at[slot],
            dw_hbm.at[pl.ds(zc0, ozc), pl.ds(cwr, orc), :],
            dw_sems.at[slot])

    for cp_ in load_copies(0, _i32(0)):
        cp_.start()

    def body(idx, acc):
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

        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)

        rows = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows + r0
        ok = ((g >= 1) & (g <= n - 2) & (cols >= 1) & (cols <= n - 2)
              & (rows >= 1) & (rows <= rs - 2))
        a_plane = jnp.where(ok, w, jnp.zeros_like(w)).astype(u_hbm.dtype)
        h2c = jnp.asarray(h2, u_hbm.dtype)

        def build_plane(t, c):
            gz = zoff + z0 + t
            gate = (gz >= 1) & (gz <= n - 2) & (t > 0) & (t < zs - 1)
            ap = jnp.where(gate, a_plane, jnp.zeros_like(a_plane))
            a_buf[t] = ap
            raw_f = fc_slots[slot, t]
            fc_slots[slot, t] = ap * (h2c * raw_f)
            if from_zero:
                # closed-form u₁ on the GLOBAL interior, including brick
                # cut planes/rows (neighbor-free, exact there too): freezing
                # cuts at u₀ = 0 is one ring staler, and the extra residual
                # sweep then reads a stale ring — restricted coarse RHS off
                # by ~1e-2 rel at multi-z-brick geometries (regression
                # test_fused_descend3_from_zero_multi_brick)
                okg = ((g >= 1) & (g <= n - 2)
                       & (cols >= 1) & (cols <= n - 2)
                       & (gz >= 1) & (gz <= n - 2))
                u_slots[slot, t] = jnp.where(
                    okg, -(w * (h2c * raw_f)),
                    jnp.zeros((rs, cp), u_hbm.dtype))
            return c

        jax.lax.fori_loop(_i32(0), _i32(zs), build_plane, _i32(0),
                          unroll=False)

        n_sweeps = steps - 1 if from_zero else steps

        def read_u(t):
            return u_slots[slot, t]

        def write_u(t, v):
            u_slots[slot, t] = v

        def read_w(t):
            return work[t]

        def write_w(t, v):
            work[t] = v

        accessors = [(read_u, write_u), (read_w, write_w)]

        def sweep(rd, wr_):
            _plane_sweep(rd, wr_, lambda t: a_buf[t],
                         lambda t: fc_slots[slot, t], zs, rs, cp)

        for s in range(n_sweeps):
            sweep(accessors[s % 2][0], accessors[(s + 1) % 2][1])
        if n_sweeps % 2 == 1:
            def copy_back(t, c):
                u_slots[slot, t] = work[t]
                return c
            jax.lax.fori_loop(_i32(0), _i32(zs), copy_back, _i32(0),
                              unroll=False)
        out_copy(idx, slot).start()

        # --- extra in-VMEM sweep: work[t] := −r(fin) on updatable cells ----
        # (Δ = a·(Σnb − 6u) − C is exactly 0 on frozen cells); the fused
        # error partial (clean metric: Σ|r| on exactly-owned interior cells,
        # f32) accumulates in the same pass.
        scale = jnp.asarray(-6.0 / (omega * h2), u_hbm.dtype)
        zero_plane = jnp.zeros((rs, cp), u_hbm.dtype)
        work[0] = zero_plane
        work[zs - 1] = zero_plane
        own_r = ((g >= _i32(j) * _i32(orow))
                 & (g < jnp.minimum((_i32(j) + 1) * _i32(orow), _i32(rp))))

        def delta_plane(t, a2):
            u = u_slots[slot, t]
            nb = (_nb_sum(u, rs, cp) + u_slots[slot, t - 1]
                  + u_slots[slot, t + 1] - 6.0 * u)
            d = a_buf[t] * nb - fc_slots[slot, t]
            work[t] = scale * d
            gz = zoff + z0 + t
            o = z0 + t - _i32(ext_z)
            own = (own_r & (gz >= 1) & (gz <= n - 2)
                   & (o >= _i32(i) * _i32(oz))
                   & (o < jnp.minimum((_i32(i) + 1) * _i32(oz),
                                      _i32(out_z))))
            av = jnp.abs(d).astype(jnp.float32)
            return a2 + jnp.sum(jnp.where(own, av, jnp.zeros_like(av)))

        part = jax.lax.fori_loop(_i32(1), _i32(zs - 1), delta_plane,
                                 jnp.zeros((), jnp.float32), unroll=False)
        part = part * abs(6.0 / (omega * h2))

        # --- full weighting + decimation into the coarse output brick -----
        wz, wr = write_z(i), write_r(j)
        zc0 = (wz + _i32(1)) // _i32(2)
        cwr = wr // _i32(2)
        wlo = _mul8(wr - r0)
        crow = jax.lax.broadcasted_iota(jnp.int32, (orc, cp), 0) + cwr
        ccol = jax.lax.broadcasted_iota(jnp.int32, (orc, cp), 1)
        keep_rc = ((crow >= 1) & (crow <= m - 2)
                   & (ccol >= 1) & (ccol <= n - 2))

        def cplane(tc, c):
            zc = zc0 + tc
            lz = jnp.clip(2 * zc + _i32(ext_z) - z0, _i32(0), _i32(zs - 1))
            if fw:
                lo = jnp.clip(lz - 1, _i32(0), _i32(zs - 1))
                hi = jnp.clip(lz + 1, _i32(0), _i32(zs - 1))
                p = 0.25 * work[lo] + 0.5 * work[lz] + 0.25 * work[hi]
                p = (0.25 * _wrap_shift(p, 1, axis=0) + 0.5 * p
                     + 0.25 * _wrap_shift(p, rs - 1, axis=0))
                p = (0.25 * _wrap_shift(p, 1, axis=1) + 0.5 * p
                     + 0.25 * _wrap_shift(p, cp - 1, axis=1))
            else:
                p = work[lz]
            dec_scr[:] = p
            win = dec_scr[pl.ds(wlo, orow), :]
            dec = win.reshape(orc, 2, cp)[:, 0, :]
            gzc = zc_off + zc
            keep = keep_rc & (gzc >= 1) & (gzc <= m - 2)
            dec_out[slot, tc] = jnp.where(keep, dec, jnp.zeros_like(dec))
            return c

        jax.lax.fori_loop(_i32(0), _i32(ozc), cplane, _i32(0), unroll=False)
        dw_copy(idx, slot).start()
        return acc + part

    total = jax.lax.fori_loop(_i32(0), _i32(num_iter), body,
                              jnp.zeros((), jnp.float32), unroll=False)
    err_smem[0, 0] = total

    last = num_iter - 1
    if num_iter >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()
        dw_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()
    out_copy(_i32(last), _i32(last % 2)).wait()
    dw_copy(_i32(last), _i32(last % 2)).wait()


def _fused_descend3_shard_call(zoff, u, f, n: int, h: float, steps: int,
                               omega: float, ext_z: int, from_zero: bool,
                               restriction: str, interpret: bool):
    """Descend leg on a (possibly z-halo-extended) volume. ``zoff`` =
    int32 (1,) GLOBAL z of plane 0; both out_z = nz − 2·ext_z and the
    global start zoff + ext_z must be EVEN under sharding (the local
    coarse-window parity argument; single-device callers pass 0/0 and an
    odd full depth, whose clipped last window the zc0 rule absorbs).
    Returns (u_out, dwide_local (out_z//2 or m planes), err (1,1))."""
    nz, rp, cp = u.shape
    assert f.shape == u.shape and f.dtype == u.dtype
    assert n % 2 == 1, "descend leg needs the odd-halve 2:1 alignment"
    fw = restriction == "full_weighting"
    if not fw and restriction != "sampling":
        raise ValueError(f"unknown restriction mode {restriction!r}")
    k_nb = steps - 1 if from_zero else steps
    cap = MAX_DESCEND3_SWEEPS_FW if fw else MAX_DESCEND3_SWEEPS_SAMPLING
    assert 0 <= k_nb <= cap and steps >= 1, (steps, from_zero, cap)

    m = (n + 1) // 2
    out_z = nz - 2 * ext_z
    z_halo = k_nb + (2 if fw else 1)
    assert ext_z == 0 or (z_halo <= ext_z and out_z % 2 == 0), (
        steps, ext_z, out_z)
    mz = m if ext_z == 0 else out_z // 2
    itemsize = jnp.dtype(u.dtype).itemsize
    # resident: 2 u + 2 f + work + A bricks + dec_scr plane + 2 quarter
    # dec_out bricks ≈ 6.6 bricks
    zs, rs, oz, orow = _brick_geometry(nz, rp, cp, itemsize, z_halo=z_halo,
                                       num_bufs=6.6, orow_mult=16,
                                       oz_even=True,
                                       budget=_VMEM_BUDGET_3D_LEGS_BYTES)
    if zs < nz:
        oz = min(oz, out_z - (out_z % 2))
    else:
        oz = out_z
    num_zb = math.ceil(out_z / oz) if zs < nz else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1
    ozc = mz if zs >= nz else oz // 2
    orc = orow // 2

    kernel = partial(_fused_descend3_kernel, n=n, nz=nz, rp=rp, cp=cp,
                     steps=steps, z_halo=z_halo, ext_z=ext_z, out_z=out_z,
                     zs=zs, rs=rs, oz=oz,
                     orow=orow, num_zb=num_zb, num_rb=num_rb, ozc=ozc,
                     h2=h * h, omega=omega, from_zero=from_zero, fw=fw)

    scratch_bytes = (6 * zs * rs + rs + 2 * ozc * orc) * cp * itemsize
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((out_z, rp, cp), u.dtype),
                   jax.ShapeDtypeStruct((mz, rp // 2, cp), u.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # u slots
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # f slots -> C
            pltpu.VMEM((zs, rs, cp), u.dtype),        # ping-pong / rneg
            pltpu.VMEM((zs, rs, cp), u.dtype),        # A coefficient brick
            pltpu.VMEM((rs, cp), u.dtype),            # FW plane scratch
            pltpu.VMEM((2, ozc, orc, cp), u.dtype),   # decimated out slots
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(scratch_bytes)),
        interpret=interpret,
    )(zoff, u, f)


def fused_descend3_padded(u, f, n: int, h: float, steps: int,
                          omega: float = 6.0 / 7.0, from_zero: bool = False,
                          restriction: str = "full_weighting",
                          interpret: bool = False):
    """The 3-D descend leg — ``steps`` fused Jacobi sweeps, the residual of
    the final iterate, z/row(/lane-smooth) restriction and the clean-metric
    error partial — in ONE brick-streamed HBM pass.

    Returns ``(u_out, dwide, err_raw)``: the smoothed padded iterate, the
    NEGATED restriction-combined residual at coarse z × coarse rows (rp//2)
    × FINE lanes, and the raw Σ|r| partial (callers divide by n³ for the
    clean metric). Finish with ops.padded3.restrict3_lanes_p (even-lane
    take + coarse repad) — a quarter-volume XLA pass. Requires the 2:1
    odd-halve alignment n = 2m − 1."""
    assert u.shape == padded_shape3(n), (u.shape, padded_shape3(n))
    return _fused_descend3_shard_call(
        jnp.zeros((1,), jnp.int32), u, f, n, h, steps, omega, ext_z=0,
        from_zero=from_zero, restriction=restriction, interpret=interpret)


def _fused_ascend3_kernel(offs_smem, u_hbm, f_hbm, cw_hbm, *rest,
                          n: int, nz: int, rp: int, cp: int, steps: int,
                          z_halo: int, ext_z: int, out_z: int,
                          zs: int, rs: int, oz: int, orow: int,
                          czs: int, crs: int,
                          num_zb: int, num_rb: int,
                          h2: float, omega: float, err_mode=None):
    """The WHOLE 3-D ascend leg in one HBM pass: trilinear prolongation of
    the coarse correction + the correction add + k post-sweeps.

    The 3-D member of the 2-D _fused_ascend_kernel family (reference leg:
    doProlongation + addition + smooth, MG_solver_CPU.cpp:682-724; the GPU
    zoom+add pair at MG_solver_GPU.cu:1364-1423). ``cw_hbm`` is the coarse
    correction ALREADY lane-expanded to fine lanes by the caller's
    quarter-volume XLA pass (ops.padded3.prolong3_lanes_p — Mosaic has no
    lane interleave); the kernel streams a (czs, crs) coarse brick next to
    every fine brick, z-interpolates per plane (2-tap dynamic leading-dim
    reads) and row-interleaves with the sublane stack-reshape, then runs
    the standard fused sweep pipeline on u + e.

    Alignment: row halo 16 (not 8) keeps fine LOAD offsets r0 ×16 so the
    coarse row window r0//2 is provably ×8; zs is even so czs = zs//2 + 1
    covers both z taps of every loaded plane at either z0 parity.

    Sharded (parallel.pallas_shard3): the fine volume is a z-shard extended
    by an EVEN ext_z (offs_smem[0] = GLOBAL z of plane 0, even), and
    ``cw_hbm`` is the matching ext-local coarse array — its plane c holds
    the coarse value of GLOBAL (offs_smem[0] + 2c)//2, so the kernel's
    fine-local//2 indexing is unchanged and only the Dirichlet gates go
    global."""
    if err_mode is None:
        out_hbm, = rest[:1]
        rest = rest[1:]
    else:
        out_hbm, err_smem = rest[:2]
        rest = rest[2:]
    u_slots, fc_slots, cw_slots, work, a_buf, load_sems, out_sems = rest
    num_iter = num_zb * num_rb
    w = jnp.asarray(omega / 6.0, u_hbm.dtype)
    half = jnp.asarray(0.5, u_hbm.dtype)
    zoff = offs_smem[0]

    def zi(idx):
        if num_rb == 1:
            return _i32(idx), _i32(0)
        return _i32(idx) // _i32(num_rb), jax.lax.rem(_i32(idx), _i32(num_rb))

    def write_z(i):
        return jnp.clip(_i32(i) * _i32(oz), _i32(0), _i32(out_z - oz))

    def load_z(i):
        # load start derives from the CLIPPED write start: with ext_z >
        # z_halo (odd-steps ascend, short final multi-pass sweeps) the naive
        # i*oz-based start can sit above the clipped window's halo floor,
        # leaving the first owned plane one ring stale (caught by review,
        # reproduced at oz∤nl multi-brick geometries)
        return jnp.clip(write_z(i) + _i32(ext_z - z_halo), _i32(0),
                        _i32(nz - zs))

    def load_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow) - _i32(16), _i32(0),
                              _i32(rp - rs)))

    def write_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow), _i32(0),
                              _i32(rp - orow)))

    def load_copies(idx, slot):
        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        cz0 = z0 // _i32(2)
        cr0 = _mul8(r0 // _i32(2))
        return (pltpu.make_async_copy(
                    u_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
                    u_slots.at[slot], load_sems.at[slot, _i32(0)]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
                    fc_slots.at[slot], load_sems.at[slot, _i32(1)]),
                pltpu.make_async_copy(
                    cw_hbm.at[pl.ds(cz0, czs), pl.ds(cr0, crs), :],
                    cw_slots.at[slot], load_sems.at[slot, _i32(2)]))

    def out_copy(idx, slot):
        i, j = zi(idx)
        wz, wr = write_z(i), write_r(j)
        zlo = wz + _i32(ext_z) - load_z(i)
        rlo = _mul8(wr - load_r(j))
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(zlo, oz), pl.ds(rlo, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    for cp_ in load_copies(0, _i32(0)):
        cp_.start()

    def body(idx, carry):
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

        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        cz0 = z0 // _i32(2)

        rows = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows + r0
        ok_rc = ((g >= 1) & (g <= n - 2) & (cols >= 1) & (cols <= n - 2))
        ok = ok_rc & (rows >= 1) & (rows <= rs - 2)
        a_plane = jnp.where(ok, w, jnp.zeros_like(w)).astype(u_hbm.dtype)
        h2c = jnp.asarray(h2, u_hbm.dtype)
        hr = rs // 2

        def build_plane(t, c):
            gz = z0 + t               # ext-local: drives the cw indexing
            gzg = zoff + gz           # global: drives the Dirichlet gates
            gate = (gzg >= 1) & (gzg <= n - 2) & (t > 0) & (t < zs - 1)
            ap = jnp.where(gate, a_plane, jnp.zeros_like(a_plane))
            a_buf[t] = ap
            fc_slots[slot, t] = ap * (h2c * fc_slots[slot, t])

            # e = trilinear(coarse) at this fine plane: 2-tap z combine of
            # the lane-expanded coarse planes, then the sublane row
            # interleave (even fine rows copy, odd average — r0 is ×16 so
            # local row parity IS global parity)
            lo = gz // _i32(2) - cz0
            hi = (gz + _i32(1)) // _i32(2) - cz0
            czp = half * (cw_slots[slot, lo] + cw_slots[slot, hi])
            ev = czp[0:hr, :]
            od = half * (czp[0:hr, :] + czp[1:hr + 1, :])
            e = jnp.stack([ev, od], axis=1).reshape(rs, cp)
            zgate = (gzg >= 1) & (gzg <= n - 2)
            e = jnp.where(ok_rc & zgate, e, jnp.zeros_like(e))
            u_slots[slot, t] = u_slots[slot, t] + e
            return c

        jax.lax.fori_loop(_i32(0), _i32(zs), build_plane, _i32(0),
                          unroll=False)

        def read_u(t):
            return u_slots[slot, t]

        def write_u(t, v):
            u_slots[slot, t] = v

        def read_w(t):
            return work[t]

        def write_w(t, v):
            work[t] = v

        accessors = [(read_u, write_u), (read_w, write_w)]

        def sweep(rd, wr_):
            _plane_sweep(rd, wr_, lambda t: a_buf[t],
                         lambda t: fc_slots[slot, t], zs, rs, cp)

        for s in range(steps):
            sweep(accessors[s % 2][0], accessors[(s + 1) % 2][1])

        part = carry
        if err_mode is not None:     # "clean": fused Σ|r(u_final)| partial
            rd_fin = accessors[steps % 2][0]
            own_r = ((g >= _i32(j) * _i32(orow))
                     & (g < jnp.minimum((_i32(j) + 1) * _i32(orow),
                                        _i32(rp)))
                     & (g >= 1) & (g <= n - 2)
                     & (cols >= 1) & (cols <= n - 2))

            def err_plane(t, a2):
                gz = zoff + z0 + t
                o = z0 + t - _i32(ext_z)
                own = (own_r & (gz >= 1) & (gz <= n - 2)
                       & (o >= _i32(i) * _i32(oz))
                       & (o < jnp.minimum((_i32(i) + 1) * _i32(oz),
                                          _i32(out_z))))
                u = rd_fin(t)
                nb = (_nb_sum(u, rs, cp) + rd_fin(t - 1) + rd_fin(t + 1)
                      - 6.0 * u)
                val = jnp.abs(a_buf[t] * nb
                              - fc_slots[slot, t]).astype(jnp.float32)
                return a2 + jnp.sum(jnp.where(own, val, jnp.zeros_like(val)))

            p = jax.lax.fori_loop(_i32(1), _i32(zs - 1), err_plane,
                                  jnp.zeros((), jnp.float32), unroll=False)
            part = carry + p * abs(6.0 / (omega * h2))

        if steps % 2 == 1:
            def copy_back(t, c):
                u_slots[slot, t] = work[t]
                return c
            jax.lax.fori_loop(_i32(0), _i32(zs), copy_back, _i32(0),
                              unroll=False)

        out_copy(idx, slot).start()
        return part

    total = jax.lax.fori_loop(_i32(0), _i32(num_iter), body,
                              jnp.zeros((), jnp.float32), unroll=False)
    if err_mode is not None:
        err_smem[0, 0] = total

    last = num_iter - 1
    if num_iter >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()
    out_copy(_i32(last), _i32(last % 2)).wait()


def _fused_ascend3_shard_call(zoff, u, f, cwide, n: int, h: float,
                              steps: int, omega: float, ext_z: int,
                              interpret: bool, err_mode=None):
    """The 3-D ascend leg — trilinear prolongation + correction add +
    ``steps`` post-sweeps — in ONE brick-streamed HBM pass.

    ``cwide`` is ops.padded3.prolong3_lanes_p(coarse_correction): the
    coarse volume at coarse z × coarse rows (rp//2 + 8) × FINE lanes.
    The added correction is masked to the fine interior (the engines'
    interior_only semantics). Requires n = 2m − 1 and steps ≥ 1.

    ``err_mode="clean"`` also returns the raw Σ|r(u_final)| partial (one
    extra in-VMEM residual sweep, callers divide by n³) — it consumes one
    halo ring, so steps ≤ 7.

    Sharded: ``zoff`` = int32 (1,) GLOBAL z of plane 0 (must be even, like
    ext_z); ``cwide`` is the ext-LOCAL coarse array — plane c ↔ global
    coarse (zoff + 2c)//2 — with ≥ nz//2 + 1 planes (single-device: zoff 0,
    ext_z 0, exactly m planes)."""
    nz, rp, cp = u.shape
    assert f.shape == u.shape and f.dtype == u.dtype
    assert n % 2 == 1, "ascend leg needs the odd-halve 2:1 alignment"
    m = (n + 1) // 2
    out_z = nz - 2 * ext_z
    assert ext_z % 2 == 0 and (ext_z == 0 or out_z % 2 == 0), (ext_z, out_z)
    cw_need = nz // 2 + 1
    assert (cwide.shape[0] >= cw_need
            and cwide.shape[1:] == (rp // 2 + 8, cp)), (
        cwide.shape, cw_need, rp, cp)
    assert cwide.dtype == u.dtype
    assert 1 <= steps <= MAX_FUSED_SWEEPS_3D
    z_halo = steps
    if err_mode is not None:
        assert err_mode == "clean" and steps <= 7, (err_mode, steps)
        z_halo = steps + 1
    assert ext_z == 0 or z_halo <= ext_z, (steps, err_mode, ext_z)

    itemsize = jnp.dtype(u.dtype).itemsize
    # resident: 2 u + 2 f + work + A bricks + 2 quarter cw bricks ≈ 6.6
    zs, rs, oz, orow = _brick_geometry(nz, rp, cp, itemsize, z_halo=z_halo,
                                       num_bufs=6.6, orow_mult=16,
                                       r_halo=16, zs_even=True,
                                       budget=_VMEM_BUDGET_3D_LEGS_BYTES)
    oz = out_z if zs >= nz else min(oz, out_z)
    num_zb = math.ceil(out_z / oz) if zs < nz else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1
    czs = (nz // 2 + 1) if zs >= nz else zs // 2 + 1
    crs = min(rs // 2 + 8, rp // 2 + 8)

    kernel = partial(_fused_ascend3_kernel, n=n, nz=nz, rp=rp, cp=cp,
                     steps=steps, z_halo=z_halo, ext_z=ext_z, out_z=out_z,
                     zs=zs, rs=rs, oz=oz,
                     orow=orow, czs=czs, crs=crs, num_zb=num_zb,
                     num_rb=num_rb, h2=h * h, omega=omega, err_mode=err_mode)

    out_shape = jax.ShapeDtypeStruct((out_z, rp, cp), u.dtype)
    out_spec = pl.BlockSpec(memory_space=pl.ANY)
    if err_mode is not None:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_spec = (out_spec, pl.BlockSpec(memory_space=pltpu.SMEM))

    scratch_bytes = (6 * zs * rs + 2 * czs * crs) * cp * itemsize
    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # u slots
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # f slots -> C
            pltpu.VMEM((2, czs, crs, cp), u.dtype),   # coarse slots
            pltpu.VMEM((zs, rs, cp), u.dtype),        # ping-pong work
            pltpu.VMEM((zs, rs, cp), u.dtype),        # A coefficient brick
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(scratch_bytes)),
        interpret=interpret,
    )(zoff, u, f, cwide)
    if err_mode is not None:
        return result[0], result[1][0, 0]
    return result


def fused_ascend3_padded(u, f, cwide, n: int, h: float, steps: int,
                         omega: float = 6.0 / 7.0, interpret: bool = False,
                         err_mode=None):
    """The 3-D ascend leg — trilinear prolongation + correction add +
    ``steps`` post-sweeps — in ONE brick-streamed HBM pass (see
    _fused_ascend3_shard_call for the full contract; this is the
    single-device entry)."""
    assert u.shape == padded_shape3(n), (u.shape, padded_shape3(n))
    return _fused_ascend3_shard_call(
        jnp.zeros((1,), jnp.int32), u, f, cwide, n, h, steps, omega,
        ext_z=0, interpret=interpret, err_mode=err_mode)


def _residual3_kernel(offs_smem, u_hbm, f_hbm, out_hbm,
                      u_slots, f_slots, out_slots, load_sems,
                      out_sems, *,
                      n: int, nz: int, rp: int, cp: int, ext_z: int,
                      out_z: int,
                      zs: int, rs: int, oz: int, orow: int,
                      num_zb: int, num_rb: int, inv_h2: float, negate: bool):
    """r = ∇²u − f (or its negation) in one brick-streamed pass.

    offs_smem / ext_z generalize over z-halo-extended shard volumes exactly
    as in _fused_jacobi3_kernel (a single halo plane suffices here)."""
    num_iter = num_zb * num_rb
    zoff = offs_smem[0]

    def zi(idx):
        if num_rb == 1:
            return _i32(idx), _i32(0)
        return _i32(idx) // _i32(num_rb), jax.lax.rem(_i32(idx), _i32(num_rb))

    def load_z(i):
        return jnp.clip(_i32(i) * _i32(oz) + _i32(ext_z - 1), _i32(0),
                        _i32(nz - zs))

    def write_z(i):
        return jnp.clip(_i32(i) * _i32(oz), _i32(0), _i32(out_z - oz))

    def load_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow) - _i32(8), _i32(0),
                              _i32(rp - rs)))

    def write_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow), _i32(0),
                              _i32(rp - orow)))

    def load_copies(idx, slot):
        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        return (pltpu.make_async_copy(
                    u_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
                    u_slots.at[slot], load_sems.at[slot, _i32(0)]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
                    f_slots.at[slot], load_sems.at[slot, _i32(1)]))

    def out_copy(idx, slot):
        i, j = zi(idx)
        wz, wr = write_z(i), write_r(j)
        zlo = wz + _i32(ext_z) - load_z(i)
        rlo = _mul8(wr - load_r(j))
        return pltpu.make_async_copy(
            out_slots.at[slot, pl.ds(zlo, oz), pl.ds(rlo, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    for cp_ in load_copies(0, _i32(0)):
        cp_.start()

    def body(idx, carry):
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

        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows + r0
        ok2 = ((g >= 1) & (g <= n - 2) & (cols >= 1) & (cols <= n - 2))
        sgn = jnp.asarray(-inv_h2 if negate else inv_h2, u_hbm.dtype)
        sgf = jnp.asarray(-1.0 if negate else 1.0, u_hbm.dtype)

        # cut/face planes are zero (never part of an owned interior cell)
        zero_plane = jnp.zeros((rs, cp), u_hbm.dtype)
        out_slots[slot, 0] = zero_plane
        out_slots[slot, zs - 1] = zero_plane

        def plane(t, c):
            u = u_slots[slot, t]
            gz = zoff + z0 + t
            nb = (_nb_sum(u, rs, cp) + u_slots[slot, t - 1]
                  + u_slots[slot, t + 1] - 6.0 * u)
            r = sgn * nb - sgf * f_slots[slot, t]
            gate = ok2 & (gz >= 1) & (gz <= n - 2)
            out_slots[slot, t] = jnp.where(gate, r, jnp.zeros_like(r))
            return c

        jax.lax.fori_loop(_i32(1), _i32(zs - 1), plane, _i32(0),
                          unroll=False)

        out_copy(idx, slot).start()
        return carry

    jax.lax.fori_loop(_i32(0), _i32(num_iter), body, _i32(0), unroll=False)

    last = num_iter - 1
    if num_iter >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()
    out_copy(_i32(last), _i32(last % 2)).wait()


def _residual3_shard_call(zoff, u, f, n: int, h: float, negate: bool,
                          ext_z: int, interpret: bool):
    """Brick-streamed 3-D residual on a (possibly z-halo-extended) volume;
    output is (nz − 2·ext_z, rp, cp). See _fused_jacobi3_shard_call."""
    nz, rp, cp = u.shape
    assert f.shape == u.shape and f.dtype == u.dtype
    assert ext_z in (0, 1), ext_z
    out_z = nz - 2 * ext_z
    itemsize = jnp.dtype(u.dtype).itemsize
    # 2 u + 2 f + 2 out slots resident
    zs, rs, oz, orow = _brick_geometry(nz, rp, cp, itemsize, z_halo=1,
                                       num_bufs=6.0)
    oz = out_z if zs >= nz else min(oz, out_z)
    num_zb = math.ceil(out_z / oz) if zs < nz else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1

    kernel = partial(_residual3_kernel, n=n, nz=nz, rp=rp, cp=cp,
                     ext_z=ext_z, out_z=out_z,
                     zs=zs, rs=rs, oz=oz, orow=orow,
                     num_zb=num_zb, num_rb=num_rb,
                     inv_h2=1.0 / (h * h), negate=negate)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_z, rp, cp), u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, zs, rs, cp), u.dtype),
            pltpu.VMEM((2, zs, rs, cp), u.dtype),
            pltpu.VMEM((2, zs, rs, cp), u.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(6 * zs * rs * cp * itemsize)),
        interpret=interpret,
    )(zoff, u, f)


def residual3_pallas(u, f, n: int, h: float, negate: bool = False,
                     interpret: bool = False):
    """3-D residual in one brick-streamed HBM pass; zero on all faces."""
    assert u.shape == padded_shape3(n), (u.shape, padded_shape3(n))
    return _residual3_shard_call(jnp.zeros((1,), jnp.int32), u, f, n, h,
                                 negate, ext_z=0, interpret=interpret)


# --- multi-word (compensated) 3-D residual ---------------------------------
# The 3-D member of the 2-D _residual_mw_kernel family (pallas_kernels):
# the dd-EFT stencil chains of refine3.residual_tw3 / residual_df3 in ONE
# brick-streamed pass. The XLA forms materialize every roll of every word —
# ~10 full-volume temporaries that both cost ~2x the inner-cycle time at
# 257³ and OOM the chip at 513³ (measured 2026-08-18); this streams
# nwords+1 volumes once with plane-sized temporaries.

def _residual_mw3_kernel(*args, n: int, nz: int, rp: int, cp: int,
                         zs: int, rs: int, oz: int, orow: int,
                         num_zb: int, num_rb: int, inv_h2: float,
                         nwords: int):
    from .pallas_kernels import _two_sum

    w_hbm = args[:nwords]
    f_hbm = args[nwords]
    out_hbm = args[nwords + 1]
    w_slots = args[nwords + 2]          # (nwords, 2, zs, rs, cp)
    f_slots = args[nwords + 3]          # (2, zs, rs, cp)
    out_slots = args[nwords + 4]        # (2, zs, rs, cp)
    load_sems = args[nwords + 5]        # (2, nwords + 1)
    out_sems = args[nwords + 6]         # (2,)
    num_iter = num_zb * num_rb

    def zi(idx):
        if num_rb == 1:
            return _i32(idx), _i32(0)
        return _i32(idx) // _i32(num_rb), jax.lax.rem(_i32(idx), _i32(num_rb))

    def load_z(i):
        return jnp.clip(_i32(i) * _i32(oz) - _i32(1), _i32(0), _i32(nz - zs))

    def write_z(i):
        return jnp.clip(_i32(i) * _i32(oz), _i32(0), _i32(nz - oz))

    def load_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow) - _i32(8), _i32(0),
                              _i32(rp - rs)))

    def write_r(j):
        return _mul8(jnp.clip(_i32(j) * _i32(orow), _i32(0),
                              _i32(rp - orow)))

    def load_copies(idx, slot):
        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        copies = tuple(
            pltpu.make_async_copy(
                w_hbm[w].at[pl.ds(z0, zs), pl.ds(r0, rs), :],
                w_slots.at[_i32(w), slot], load_sems.at[slot, _i32(w)])
            for w in range(nwords))
        copies += (pltpu.make_async_copy(
            f_hbm.at[pl.ds(z0, zs), pl.ds(r0, rs), :],
            f_slots.at[slot], load_sems.at[slot, _i32(nwords)]),)
        return copies

    def out_copy(idx, slot):
        i, j = zi(idx)
        wz, wr = write_z(i), write_r(j)
        zlo = wz - load_z(i)
        rlo = _mul8(wr - load_r(j))
        return pltpu.make_async_copy(
            out_slots.at[slot, pl.ds(zlo, oz), pl.ds(rlo, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    for cp_ in load_copies(0, _i32(0)):
        cp_.start()

    def dd_chain(w, slot, t):
        """(hi, lo, lo2): doubly-compensated 7-point stencil sum of word w
        at plane t — refine3._eft_stencil_sum_dd3's exact op order (z pair
        first, then in-plane shifts, then the six −u terms)."""
        u = w_slots[_i32(w), slot, t]
        hi, lo = _two_sum(w_slots[_i32(w), slot, t - 1],
                          w_slots[_i32(w), slot, t + 1])
        lo2 = jnp.zeros_like(hi)
        un = _wrap_shift(u, 1, axis=0)
        us = _wrap_shift(u, rs - 1, axis=0)
        uw = _wrap_shift(u, 1, axis=1)
        ue = _wrap_shift(u, cp - 1, axis=1)
        for term in (un, us, uw, ue, -u, -u, -u, -u, -u, -u):
            hi, e = _two_sum(hi, term)
            lo, e2 = _two_sum(lo, e)
            lo2 = lo2 + e2
        hi, e = _two_sum(hi, lo)
        lo, e2 = _two_sum(e, lo2)
        return hi, lo, e2

    def body(idx, carry):
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

        i, j = zi(idx)
        z0, r0 = load_z(i), load_r(j)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows + r0
        ok2 = ((g >= 1) & (g <= n - 2) & (cols >= 1) & (cols <= n - 2))
        c = jnp.asarray(inv_h2, f_hbm.dtype)

        zero_plane = jnp.zeros((rs, cp), f_hbm.dtype)
        out_slots[slot, 0] = zero_plane
        out_slots[slot, zs - 1] = zero_plane

        def plane(t, cc):
            hi0, lo0, m0 = dd_chain(0, slot, t)
            if nwords >= 2:
                hi1, lo1, m1 = dd_chain(1, slot, t)
            else:
                hi1 = lo1 = m1 = jnp.zeros_like(hi0)
            if nwords == 3:
                u2 = w_slots[_i32(2), slot, t]
                s2 = (w_slots[_i32(2), slot, t - 1]
                      + w_slots[_i32(2), slot, t + 1]
                      + _wrap_shift(u2, 1, axis=0)
                      + _wrap_shift(u2, rs - 1, axis=0)
                      + _wrap_shift(u2, 1, axis=1)
                      + _wrap_shift(u2, cp - 1, axis=1) - 6.0 * u2)
            else:
                s2 = jnp.zeros_like(hi0)

            # combination identical to refine3.residual_tw3
            r_big = hi0 * c - f_slots[slot, t]
            t_, tc = _two_sum(lo0, hi1)
            t2 = ((lo1 + m0) + (m1 + s2)) + tc
            r = (r_big + t_ * c) + t2 * c

            gz = z0 + t
            gate = ok2 & (gz >= 1) & (gz <= n - 2)
            out_slots[slot, t] = jnp.where(gate, r, jnp.zeros_like(r))
            return cc

        jax.lax.fori_loop(_i32(1), _i32(zs - 1), plane, _i32(0),
                          unroll=False)
        out_copy(idx, slot).start()
        return carry

    jax.lax.fori_loop(_i32(0), _i32(num_iter), body, _i32(0), unroll=False)

    last = num_iter - 1
    if num_iter >= 2:
        out_copy(_i32(last - 1), _i32((last - 1) % 2)).wait()
    out_copy(_i32(last), _i32(last % 2)).wait()


def _residual_mw3_call(words, f, n: int, h: float, interpret: bool):
    nwords = len(words)
    nz, rp, cp = f.shape
    assert (nz, rp, cp) == padded_shape3(n), (f.shape, padded_shape3(n))
    for w in words:
        assert w.shape == f.shape and w.dtype == f.dtype
    itemsize = jnp.dtype(f.dtype).itemsize

    num_bufs = 2 * nwords + 4        # nwords×2 word slots + 2 f + 2 out
    zs, rs, oz, orow = _brick_geometry(nz, rp, cp, itemsize, z_halo=1,
                                       num_bufs=float(num_bufs))
    num_zb = math.ceil(nz / oz) if zs < nz else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1

    kernel = partial(_residual_mw3_kernel, n=n, nz=nz, rp=rp, cp=cp,
                     zs=zs, rs=rs, oz=oz, orow=orow,
                     num_zb=num_zb, num_rb=num_rb,
                     inv_h2=1.0 / (h * h), nwords=nwords)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nz, rp, cp), f.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (nwords + 1),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nwords, 2, zs, rs, cp), f.dtype),
            pltpu.VMEM((2, zs, rs, cp), f.dtype),
            pltpu.VMEM((2, zs, rs, cp), f.dtype),
            pltpu.SemaphoreType.DMA((2, nwords + 1)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(num_bufs * zs * rs * cp * itemsize)),
        interpret=interpret,
    )(*words, f)


@partial(jax.jit, static_argnames=("n", "h", "interpret"))
def residual_tw3_pallas(u0, u1, u2, f, n: int, h: float,
                        interpret: bool = False):
    """Brick-streamed compensated residual of the 3-D triple-word state
    (padded layout); matches refine3.residual_tw3 bit-for-bit in op order."""
    return _residual_mw3_call((u0, u1, u2), f, n, h, interpret)


@partial(jax.jit, static_argnames=("n", "h", "interpret"))
def residual_df3_pallas(u0, u1, f, n: int, h: float, interpret: bool = False):
    """Brick-streamed compensated residual of the 3-D double-word state.
    Slightly MORE accurate than refine3.residual_df3 (the second word also
    gets the dd-EFT chain, as in the 2-D residual_df_pallas) — acceptable:
    callers treat the result as the truth."""
    return _residual_mw3_call((u0, u1), f, n, h, interpret)


# --- in-VMEM 3-D error-trigger smoothing -----------------------------------

TRIGGER3_VMEM_BUDGET = 96 * 1024 * 1024


def trigger3_fits(n: int, itemsize: int = 4,
                  budget: int = TRIGGER3_VMEM_BUDGET) -> bool:
    """The 3-D trigger loop holds u (ping-pong ×2) + the folded source
    volume resident, plus plane-sized temporaries."""
    nz, rp, cp = padded_shape3(n)
    return 3 * nz * rp * cp * itemsize + 8 * 1024 * 1024 <= budget


def _trigger3_vmem_kernel(u_hbm, f_hbm, out_hbm, stat_smem, A, B, FC, sem, *,
                          n: int, nz: int, rp: int, cp: int, h2: float,
                          omega: float, trigger: float, compat,
                          max_sweeps: int):
    """The whole 3-D error-trigger loop in ONE kernel (the 2-D
    pallas_chain._trigger_vmem_kernel one dimension up): sweep while
    |err_k − err_{k−1}| > trigger, the full volume resident in VMEM — no
    HBM traffic and no dispatch per sweep. Sweep expressions and metrics
    (clean via the extra-sweep Δ identity, gpu via |ΔU|) mirror
    _fused_jacobi3_kernel exactly; plane loops are fori_loops like every
    3-D kernel here (unrolled planes crash the compiler)."""
    dtype = u_hbm.dtype
    # stage f through B (overwritten by the first sweep) to build FC
    cp_f = pltpu.make_async_copy(f_hbm, B, sem)
    cp_f.start()
    cp_f.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 1)
    ok2d = ((rows >= 1) & (rows <= n - 2) & (cols >= 1) & (cols <= n - 2))
    w = jnp.asarray(omega / 6.0, dtype)
    a2d = jnp.where(ok2d, w, jnp.zeros((rp, cp), dtype))
    h2c = jnp.asarray(h2, dtype)
    zero_plane = jnp.zeros((rp, cp), dtype)

    def ap(t):
        # scalar z-gate as a multiplier (see masked_plane_sum)
        gate = jnp.where((t >= 1) & (t <= n - 2),
                         jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
        return a2d * gate

    def build_fc(t, c):
        FC[t] = ap(t) * (h2c * B[t])
        return c

    jax.lax.fori_loop(_i32(0), _i32(nz), build_fc, _i32(0), unroll=False)

    cp_u = pltpu.make_async_copy(u_hbm, A, sem)
    cp_u.start()
    cp_u.wait()

    if compat == "gpu":
        scale = 6.0 / h2 / (n ** 3)
    else:
        scale = 6.0 / (omega * h2) / (n ** 3)

    def masked_plane_sum(t, val):
        # z-gate as a SCALAR multiplier: Mosaic cannot select between
        # boolean vectors (arith.select on vector<i1> fails to legalize)
        gate = jnp.where((t >= 1) & (t <= n - 2),
                         jnp.float32(1.0), jnp.float32(0.0))
        v = jnp.abs(val).astype(jnp.float32)
        return gate * jnp.sum(jnp.where(ok2d, v, jnp.zeros_like(v)))

    blk = _sweep_blk()
    nblk = (nz - 2) // blk if blk > 1 else 0

    def step(S, D):
        """One sweep S → D (+ metric of the new iterate in D); returns the
        metric. No copy-back: the caller alternates (A,B)/(B,A) by sweep
        PARITY — removing the per-sweep nz-plane copy is FP-neutral, so
        iterates/metrics stay bit-identical to the copy-back form.
        Interior loops use the multi-output-plane blocking of _plane_sweep
        (same per-plane expressions and the same ascending accumulation
        order — bit-identical to the plain loop)."""
        D[0] = S[0]
        D[_i32(nz - 1)] = S[_i32(nz - 1)]

        def upd_one(t, acc, um, u, up):
            nb = _nb_sum(u, rp, cp) + um + up - 6.0 * u
            unew = u + ap(t) * nb - FC[t]
            D[t] = unew
            if compat == "gpu":
                acc = acc + masked_plane_sum(t, unew - u)
            return acc

        if blk > 1:
            def plane_blk(i, acc):
                t = _i32(1) + _i32(blk) * _i32(i)
                us = [S[t + _i32(d)] for d in range(-1, blk + 1)]
                for d in range(blk):
                    acc = upd_one(t + _i32(d), acc, us[d], us[d + 1],
                                  us[d + 2])
                return acc

            raw = jax.lax.fori_loop(_i32(0), _i32(nblk), plane_blk,
                                    jnp.zeros((), jnp.float32),
                                    unroll=False)
            for t_ in range(1 + nblk * blk, nz - 1):        # static tail
                t = _i32(t_)
                raw = upd_one(t, raw, S[t - 1], S[t], S[t + 1])
        else:
            def plane(t, acc):
                return upd_one(t, acc, S[t - 1], S[t], S[t + 1])

            raw = jax.lax.fori_loop(_i32(1), _i32(nz - 1), plane,
                                    jnp.zeros((), jnp.float32),
                                    unroll=False)

        if compat != "gpu":
            # clean metric of the NEW iterate: extra in-VMEM sweep Δ
            def racc_one(t, acc, um, u, up):
                nb = _nb_sum(u, rp, cp) + um + up - 6.0 * u
                return acc + masked_plane_sum(t, ap(t) * nb - FC[t])

            if blk > 1:
                def rplane_blk(i, acc):
                    t = _i32(1) + _i32(blk) * _i32(i)
                    us = [D[t + _i32(d)] for d in range(-1, blk + 1)]
                    for d in range(blk):
                        acc = racc_one(t + _i32(d), acc, us[d], us[d + 1],
                                       us[d + 2])
                    return acc

                raw = jax.lax.fori_loop(_i32(0), _i32(nblk), rplane_blk,
                                        jnp.zeros((), jnp.float32),
                                        unroll=False)
                for t_ in range(1 + nblk * blk, nz - 1):
                    t = _i32(t_)
                    raw = racc_one(t, raw, D[t - 1], D[t], D[t + 1])
            else:
                def rplane(t, acc):
                    return racc_one(t, acc, D[t - 1], D[t], D[t + 1])

                raw = jax.lax.fori_loop(_i32(1), _i32(nz - 1), rplane,
                                        jnp.zeros((), jnp.float32),
                                        unroll=False)

        return raw * jnp.float32(scale)

    err0 = step(A, B)                    # iterate 1 lands in B (parity 1)

    def cond(carry):
        _, slope, k, _ = carry
        return jnp.logical_and(slope > trigger, k < max_sweeps)

    def body(carry):
        prev, _, k, par = carry
        # parity selects the sweep direction; both branches write disjoint
        # destinations, so the cond is side-effect-safe
        err = jax.lax.cond(par == 1, lambda: step(B, A),
                           lambda: step(A, B))
        return err, jnp.abs(err - prev), k + 1, 1 - par

    err, _, k, par = jax.lax.while_loop(
        cond, body,
        (err0, jnp.float32(trigger + 1.0), jnp.int32(1), jnp.int32(1)))
    stat_smem[0, 0] = err
    stat_smem[0, 1] = k.astype(jnp.float32)

    # final iterate is in B when parity is odd — normalize once at exit
    # (the copy-back form paid this every sweep)
    @pl.when(par == 1)
    def _():
        def copy_back(t, c):
            A[t] = B[t]
            return c

        jax.lax.fori_loop(_i32(0), _i32(nz), copy_back, _i32(0),
                          unroll=False)

    cp_out = pltpu.make_async_copy(A, out_hbm, sem)
    cp_out.start()
    cp_out.wait()


# --- u-resident / f-streamed 3-D trigger (the 257³ size class) -----------------
#
# The pure in-VMEM trigger above holds THREE volumes (u, ping-pong, FC) —
# ~129³ max. One class up (257³: one padded volume is 104 MB of the
# 128 MiB VMEM) only the ITERATE can stay resident: this kernel updates u
# in place (a one-plane edge buffer carries the pre-update plane t−1 — the
# 2-D pallas_chain stream kernel's wavefront, one dimension up, with
# z-plane blocks as the strips) and streams f in triple-buffered
# ZB3-plane blocks once per sweep. Per-sweep HBM traffic: ONE f read and
# zero dispatch, vs the per-pass path's u read + u write + f read + a
# dispatch. The clean metric of the new iterate (extra-Δ identity) runs
# one BLOCK behind the commits, where all committed neighbors exist and
# the previous block's f slot is still live; gpu falls out of the commit
# Δ directly. Reference: the trigger loops, MG_solver_CPU.cpp:194-240.

TRIGGER3_STREAM_BUDGET = int(os.environ.get(
    "MG_TRIGGER3_STREAM_BUDGET", 116 * 1024 * 1024))
ZB3 = 8                        # f planes per streamed block


def trigger3_stream_fits(n: int, itemsize: int = 4) -> bool:
    nz, rp, cp = padded_shape3(n)
    plane = rp * cp * itemsize
    if nz < 2 * ZB3:
        return False           # block machinery assumes ≥2 blocks' worth
    total = nz * plane + 3 * ZB3 * plane + 10 * plane
    return total <= TRIGGER3_STREAM_BUDGET


def _trigger3_stream_kernel(u_hbm, f_hbm, out_hbm, stat_smem, U, fblk, edge,
                            sem, fsems, *, n: int, nz: int, rp: int,
                            cp: int, h2: float, omega: float,
                            trigger: float, compat, max_sweeps: int):
    dtype = u_hbm.dtype
    nb_blocks = -(-nz // ZB3)

    cp_u = pltpu.make_async_copy(u_hbm, U, sem)
    cp_u.start()
    cp_u.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 1)
    ok2d = ((rows >= 1) & (rows <= n - 2) & (cols >= 1) & (cols <= n - 2))
    w = jnp.asarray(omega / 6.0, dtype)
    a2d = jnp.where(ok2d, w, jnp.zeros((rp, cp), dtype))
    h2c = jnp.asarray(h2, dtype)

    def ap(t):
        gate = jnp.where((t >= 1) & (t <= n - 2),
                         jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
        return a2d * gate

    if compat == "gpu":
        scale = 6.0 / h2 / (n ** 3)
    else:
        scale = 6.0 / (omega * h2) / (n ** 3)

    def masked_plane_sum(t, val):
        gate = jnp.where((t >= 1) & (t <= n - 2),
                         jnp.float32(1.0), jnp.float32(0.0))
        v = jnp.abs(val).astype(jnp.float32)
        return gate * jnp.sum(jnp.where(ok2d, v, jnp.zeros_like(v)))

    def blk_lo(b):
        # clamped DMA window: the last block re-reads a few planes so every
        # transfer is a full ZB3 planes in range
        return jnp.minimum(_i32(b) * _i32(ZB3), _i32(nz - ZB3))

    def f_dma(b, slot):
        return pltpu.make_async_copy(
            f_hbm.at[pl.ds(blk_lo(b), ZB3)], fblk.at[slot],
            fsems.at[slot])

    def fc_at(b, slot, t):
        return ap(t) * (h2c * fblk[slot, t - blk_lo(b)])

    def commit_block(b, slot, raw):
        """In-place update of block b's interior planes; returns raw + the
        gpu-metric partial (0 for clean — that lags one block)."""
        lo = jnp.maximum(_i32(1), _i32(b) * _i32(ZB3))
        hi = jnp.minimum(_i32(nz - 1), (_i32(b) + 1) * _i32(ZB3))

        def plane(t, acc):
            um = edge[:]
            u = U[t]
            up = U[t + 1]
            nb = _nb_sum(u, rp, cp) + um + up - 6.0 * u
            unew = u + ap(t) * nb - fc_at(b, slot, t)
            edge[:] = u
            U[t] = unew
            if compat == "gpu":
                acc = acc + masked_plane_sum(t, unew - u)
            return acc

        return jax.lax.fori_loop(lo, hi, plane, raw, unroll=False)

    def err_block(b, slot, raw):
        """Clean-metric partial of block b's planes via the extra-Δ
        identity, on fully-committed neighbors."""
        lo = jnp.maximum(_i32(1), _i32(b) * _i32(ZB3))
        hi = jnp.minimum(_i32(nz - 1), (_i32(b) + 1) * _i32(ZB3))

        def plane(t, acc):
            u = U[t]
            nb = _nb_sum(u, rp, cp) + U[t - 1] + U[t + 1] - 6.0 * u
            d = ap(t) * nb - fc_at(b, slot, t)
            return acc + masked_plane_sum(t, d)

        return jax.lax.fori_loop(lo, hi, plane, raw, unroll=False)

    def sweep_once():
        edge[:] = U[0]                 # old plane 0 (frozen, never written)
        f_dma(0, _i32(0)).start()
        if nb_blocks > 1:
            f_dma(1, _i32(1)).start()

        def body(b, raw):
            slot = jax.lax.rem(_i32(b), _i32(3))
            f_dma(b, slot).wait()
            raw = commit_block(b, slot, raw)
            if compat != "gpu":
                # err of block b−1 (all neighbors committed; its f slot is
                # still live). At b = 0 the clamped evaluation reads valid
                # planes and the z-gates zero every contribution of the
                # out-of-range window.
                pslot = jax.lax.rem(_i32(b) + _i32(2), _i32(3))
                bm = jnp.maximum(_i32(0), _i32(b) - 1)
                e = err_block(bm, pslot, jnp.float32(0.0))
                raw = raw + jnp.where(b >= 1, e, jnp.float32(0.0))

            @pl.when(_i32(b) + 2 < _i32(nb_blocks))
            def _():
                f_dma(b + 2, jax.lax.rem(_i32(b) + _i32(2), _i32(3))).start()
            return raw

        raw = jax.lax.fori_loop(_i32(0), _i32(nb_blocks), body,
                                jnp.zeros((), jnp.float32), unroll=False)
        if compat != "gpu":
            lslot = jax.lax.rem(_i32(nb_blocks - 1), _i32(3))
            raw = err_block(nb_blocks - 1, lslot, raw)
        return raw * jnp.float32(scale)

    err0 = sweep_once()

    def cond(carry):
        _, slope, k = carry
        return jnp.logical_and(slope > trigger, k < max_sweeps)

    def body(carry):
        prev, _, k = carry
        err = sweep_once()
        return err, jnp.abs(err - prev), k + 1

    err, _, k = jax.lax.while_loop(
        cond, body, (err0, jnp.float32(trigger + 1.0), jnp.int32(1)))
    stat_smem[0, 0] = err
    stat_smem[0, 1] = k.astype(jnp.float32)

    cp_out = pltpu.make_async_copy(U, out_hbm, sem)
    cp_out.start()
    cp_out.wait()


@partial(jax.jit, static_argnames=("n", "h", "trigger", "omega", "compat",
                                   "max_sweeps", "interpret"))
def fused_trigger3_stream(u, f, n: int, h: float, trigger: float,
                          omega: float, compat, max_sweeps: int,
                          interpret: bool = False):
    """3-D error-triggered smoothing with the iterate resident and f
    streamed in plane blocks (the 257³ class — see the module note above);
    returns (u_new, err) like fused_trigger3_vmem (err normalized by n³)."""
    nz, rp, cp = padded_shape3(n)
    assert u.shape == (nz, rp, cp) and trigger3_stream_fits(n)
    kernel = partial(_trigger3_stream_kernel, n=n, nz=nz, rp=rp, cp=cp,
                     h2=h * h, omega=omega, trigger=trigger, compat=compat,
                     max_sweeps=max_sweeps)
    out, stat = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nz, rp, cp), u.dtype),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((nz, rp, cp), u.dtype),      # resident u
                        pltpu.VMEM((3, ZB3, rp, cp), u.dtype),  # f blocks
                        pltpu.VMEM((rp, cp), u.dtype),          # edge plane
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(TRIGGER3_STREAM_BUDGET + 8 * 1024 * 1024,
                                 126 * 1024 * 1024)),
        interpret=interpret,
    )(u, f)
    return out, stat[0, 0].astype(u.dtype)


@partial(jax.jit, static_argnames=("n", "h", "trigger", "omega", "compat",
                                   "max_sweeps", "interpret"))
def fused_trigger3_vmem(u, f, n: int, h: float, trigger: float, omega: float,
                        compat, max_sweeps: int, interpret: bool = False):
    """3-D error-triggered smoothing with the whole loop in VMEM (padded
    (nz, rp, cp) layout); returns (u_new, err) like compiled3's per-pass
    trigger path — err already normalized by n³."""
    nz, rp, cp = padded_shape3(n)
    assert u.shape == (nz, rp, cp) and trigger3_fits(n)
    kernel = partial(_trigger3_vmem_kernel, n=n, nz=nz, rp=rp, cp=cp,
                     h2=h * h, omega=omega, trigger=trigger, compat=compat,
                     max_sweeps=max_sweeps)
    out, stat = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nz, rp, cp), u.dtype),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((nz, rp, cp), u.dtype),
                        pltpu.VMEM((nz, rp, cp), u.dtype),
                        pltpu.VMEM((nz, rp, cp), u.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(3 * nz * rp * cp * 4)),
        interpret=interpret,
    )(u, f)
    return out, stat[0, 0].astype(u.dtype)

"""RDMA halo exchange inside the fused smoother kernel (multi-chip overlap).

The shard_map smoother (parallel/pallas_shard.py) pays a ``lax.ppermute``
BARRIER before every fused ≤8-sweep pass: XLA serializes collective →
kernel, so each pass eats a full ICI round-trip of latency before any
compute starts. This module moves the halo exchange INTO the Pallas kernel
as inter-chip DMAs (``pltpu.make_async_remote_copy``): each device posts its
8 edge rows of ``u`` and ``f`` to its ring neighbors' VMEM halo buffers,
then streams and smooths its INTERIOR strips while the wires are busy; only
the (at most two) boundary strips wait on the receive semaphores. The
exchange rides ICI exactly like the ppermute, but overlapped with compute
instead of in front of it.

Semantics are identical to ``parallel.pallas_shard.sharded_fused_jacobi``
(itself bit-matching the single-chip fused kernel, i.e. doSmoothing,
/root/reference/src/MG_solver_CPU.cpp:573-604): the 8-row halo bounds the
usual trapezoid staleness for ≤8 fused sweeps, ``from_zero`` passes skip the
``u`` exchange entirely (the closed-form first sweep never reads u — only f
halos stream). The reference has no counterpart (single GPU); this is the
halo exchange a multi-GPU port would bolt around ker_Smoothing_GPU
(MG_solver_GPU.cu:584-661), done the TPU way.

Validation: bit-match vs the ppermute path and the unsharded kernel on the
8-virtual-device CPU mesh under the full TPU interpreter
(``pltpu.InterpretParams(detect_races=True)`` — remote DMAs + semaphores
simulated, data races detected); Mosaic lowering compile-checked on real
hardware with a 1-device mesh (tests/test_rdma.py, examples/exp_rdma_tpu.py).
Multi-chip wall-clock gains need real multi-chip hardware (ROADMAP item 6).

Protocol notes:
  * a neighbor BARRIER (``get_barrier_semaphore`` + gated signal/wait) opens
    the kernel: nobody writes into a neighbor's halo buffers until that
    neighbor has entered this kernel instance — without it a fast sender
    could land a remote DMA in a buffer the receiver's PREVIOUS program
    still owns;
  * four independent DMA channels (u/f × up/down), each with its own
    send/recv semaphore pair, all posted back-to-back after the barrier;
  * strips process in interior-first order; the static (python-level) strip
    schedule makes every halo splice a static slice, so no Mosaic dynamic-
    offset alignment hints are needed anywhere;
  * devices at the global domain edge zero-fill their missing halo buffers
    (the rows are globally masked — zeros keep NaN/Inf garbage out of the
    neighbor sums, which masks multiply by 0 but 0·NaN = NaN).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_kernels as pk
from .pallas_kernels import (
    HALO,
    _i32,
    _nb_sum,
    _strip_geometry,
)

# Unrolled-strip program-size guard: the static strip schedule trades fori
# overhead for python unrolling, sized for SHARD blocks (a 8193²/8-device
# shard at the 32 MiB budget is ~8 strips). The 2-D unroll wall observed on
# this toolchain is far higher (~30 plane statements in the 3-D kernels).
MAX_RDMA_STRIPS = 32


def _rdma_jacobi_kernel(meta_smem, u_hbm, f_hbm, out_hbm,
                        hu, hf, u_slots, fc_slots, work, a_buf,
                        load_sems, out_sems, usend, urecv, fsend, frecv,
                        *, n: int, rows: int, cp: int, steps: int,
                        num_strips: int, strip: int, owned: int,
                        h2: float, omega: float, from_zero: bool,
                        ndev: int, axis_name: str):
    """One fused ≤8-sweep damped-Jacobi pass on a LOCAL (rows, cp) block,
    exchanging 8-row u/f halos with ring neighbors in-kernel.

    meta_smem = (row0, col0) int32: global grid coordinates of the VIRTUAL
    extended block's [0, 0] (row0 = my·rows − HALO). The mesh position comes
    from ``lax.axis_index(axis_name)`` INSIDE the kernel — Mosaic detects
    cross-device communication by scanning the kernel jaxpr for mesh-axis
    references, so the index must be taken here, not passed via SMEM (or the
    lowering drops the mesh context and remote DMAs fail with a "0D mesh"
    error). hu/hf hold [0] = top halo (virtual rows [0, HALO)) and
    [1] = bottom halo; the owned block spans virtual rows [HALO, HALO+rows).
    """
    row0 = meta_smem[0]
    col0 = meta_smem[1]
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    erows = rows + 2 * HALO

    has_up = my > 0
    has_dn = my < ndev - 1
    up = jnp.maximum(my - 1, 0)
    dn = jnp.minimum(my + 1, ndev - 1)

    # --- neighbor barrier: don't write into a buffer whose owner hasn't
    # --- entered this kernel instance yet -------------------------------
    if ndev > 1:
        bsem = pltpu.get_barrier_semaphore()

        @pl.when(has_up)
        def _():
            pltpu.semaphore_signal(bsem, 1, device_id=(up,),
                                   device_id_type=pltpu.DeviceIdType.MESH)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_signal(bsem, 1, device_id=(dn,),
                                   device_id_type=pltpu.DeviceIdType.MESH)

        cnt = has_up.astype(jnp.int32) + has_dn.astype(jnp.int32)
        pltpu.semaphore_wait(bsem, cnt)

    # --- post the halo sends (u skipped on from_zero passes) -------------
    # Channel convention: my rows [0, H) are the UP neighbor's BOTTOM halo
    # (its hu[1]); my rows [rows−H, rows) are the DOWN neighbor's TOP halo
    # (its hu[0]). Each channel owns a send/recv semaphore pair, so the
    # matching wait_recv on the receiving side counts the right bytes.
    def remote(src, dst, ss, rs, dev):
        return pltpu.make_async_remote_copy(
            src_ref=src, dst_ref=dst, send_sem=ss, recv_sem=rs,
            device_id=(dev,), device_id_type=pltpu.DeviceIdType.MESH)

    su = remote(u_hbm.at[pl.ds(0, HALO)], hu.at[1], usend.at[0],
                urecv.at[0], up)
    sd = remote(u_hbm.at[pl.ds(rows - HALO, HALO)], hu.at[0], usend.at[1],
                urecv.at[1], dn)
    fu = remote(f_hbm.at[pl.ds(0, HALO)], hf.at[1], fsend.at[0],
                frecv.at[0], up)
    fd = remote(f_hbm.at[pl.ds(rows - HALO, HALO)], hf.at[0], fsend.at[1],
                frecv.at[1], dn)

    @pl.when(has_up)
    def _():
        fu.start()
        if not from_zero:
            su.start()

    @pl.when(has_dn)
    def _():
        fd.start()
        if not from_zero:
            sd.start()

    # domain-edge devices fabricate their missing halos (globally masked
    # rows — zero keeps the neighbor sums NaN-free)
    @pl.when(jnp.logical_not(has_up))
    def _():
        hf[0] = jnp.zeros((HALO, cp), f_hbm.dtype)
        if not from_zero:
            hu[0] = jnp.zeros((HALO, cp), u_hbm.dtype)

    @pl.when(jnp.logical_not(has_dn))
    def _():
        hf[1] = jnp.zeros((HALO, cp), f_hbm.dtype)
        if not from_zero:
            hu[1] = jnp.zeros((HALO, cp), u_hbm.dtype)

    # --- static strip schedule, interior strips first ---------------------
    order = (list(range(1, num_strips - 1)) + [0]
             + ([num_strips - 1] if num_strips >= 2 else []))

    def win(sid: int):
        """Static virtual window [s, s+strip) and its halo overlaps."""
        s = min(max(sid * owned, 0), erows - strip)
        top_ov = min(strip, max(0, HALO - s))
        bot_ov = max(0, s + strip - (HALO + rows))
        return s, top_ov, bot_ov

    def load_copies(sid: int, slot):
        s, top_ov, bot_ov = win(sid)
        body_rows = strip - top_ov - bot_ov
        copies = (pltpu.make_async_copy(
            f_hbm.at[pl.ds(s + top_ov - HALO, body_rows)],
            fc_slots.at[slot, pl.ds(top_ov, body_rows)],
            load_sems.at[slot, _i32(1)]),)
        if not from_zero:
            copies += (pltpu.make_async_copy(
                u_hbm.at[pl.ds(s + top_ov - HALO, body_rows)],
                u_slots.at[slot, pl.ds(top_ov, body_rows)],
                load_sems.at[slot, _i32(0)]),)
        return copies

    def out_copy(sid: int, slot):
        wstart = min(sid * owned, rows - owned)
        s, _, _ = win(sid)
        wlo = wstart + HALO - s
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wlo, owned)],
            out_hbm.at[pl.ds(wstart, owned)],
            out_sems.at[slot])

    waited = {"top": False, "bot": False}

    def splice_halos(sid: int, slot):
        """Wait the needed receive channels (once) and patch the halo rows
        of the strip buffers — all static slices."""
        s, top_ov, bot_ov = win(sid)
        if top_ov:
            if not waited["top"]:
                waited["top"] = True

                @pl.when(has_up)
                def _():
                    fd_in = remote(f_hbm.at[pl.ds(rows - HALO, HALO)],
                                   hf.at[0], fsend.at[1], frecv.at[1], dn)
                    fd_in.wait_recv()
                    if not from_zero:
                        sd_in = remote(u_hbm.at[pl.ds(rows - HALO, HALO)],
                                       hu.at[0], usend.at[1], urecv.at[1], dn)
                        sd_in.wait_recv()
            fc_slots[slot, s:s + top_ov] = hf[0, s:s + top_ov]
            if not from_zero:
                u_slots[slot, 0:top_ov] = hu[0, s:s + top_ov]
        if bot_ov:
            if not waited["bot"]:
                waited["bot"] = True

                @pl.when(has_dn)
                def _():
                    fu_in = remote(f_hbm.at[pl.ds(0, HALO)], hf.at[1],
                                   fsend.at[0], frecv.at[0], up)
                    fu_in.wait_recv()
                    if not from_zero:
                        su_in = remote(u_hbm.at[pl.ds(0, HALO)], hu.at[1],
                                       usend.at[0], urecv.at[0], up)
                        su_in.wait_recv()
            lo = s + strip - bot_ov - (HALO + rows)
            fc_slots[slot, strip - bot_ov:strip] = hf[1, lo:lo + bot_ov]
            if not from_zero:
                u_slots[slot, strip - bot_ov:strip] = hu[1, lo:lo + bot_ov]

    for cp_ in load_copies(order[0], _i32(0)):
        cp_.start()

    n_sweeps = steps - 1 if from_zero else steps

    for p, sid in enumerate(order):
        slot = _i32(p % 2)
        nxt = _i32((p + 1) % 2)

        if p + 1 < len(order):
            if p >= 1:
                out_copy(order[p - 1], nxt).wait()
            for cp_ in load_copies(order[p + 1], nxt):
                cp_.start()

        for cp_ in load_copies(sid, slot):
            cp_.wait()
        splice_halos(sid, slot)

        s, _, _ = win(sid)

        # --- per-strip coefficients (identical to _fused_jacobi_kernel) --
        riota = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (strip, cp), 1)
        g = riota + s + row0
        gc = ciota + col0
        ok_global = ((g >= 1) & (g <= n - 2) & (gc >= 1) & (gc <= n - 2))
        ok = (ok_global & (riota >= 1) & (riota <= strip - 2)
              & (ciota >= 1) & (ciota <= cp - 2))
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
                jnp.zeros((strip, cp), u_hbm.dtype))

        def sweep(src, dst):
            u = src[:]
            dst[:] = u + a_buf[:] * (_nb_sum(u, strip, cp) - 4.0 * u) \
                - fc_slots[slot][:]

        bufs = [u_slots.at[slot], work]
        for sw in range(n_sweeps):
            sweep(bufs[sw % 2], bufs[(sw + 1) % 2])
        if n_sweeps % 2 == 1:
            u_slots[slot] = work[:]

        out_copy(sid, slot).start()

    if len(order) >= 2:
        out_copy(order[-2], _i32((len(order) - 2) % 2)).wait()
    out_copy(order[-1], _i32((len(order) - 1) % 2)).wait()

    # sends must drain before the kernel (and its buffers) retire
    @pl.when(has_up)
    def _():
        fu.wait_send()
        if not from_zero:
            su.wait_send()

    @pl.when(has_dn)
    def _():
        fd.wait_send()
        if not from_zero:
            sd.wait_send()


def _rdma_jacobi_shard_call(meta, u, f, n: int, h: float, steps: int,
                            omega: float, from_zero: bool, ndev: int,
                            interpret, axis_name: str = "rows"):
    """One fused ≤8-sweep RDMA pass on a LOCAL (rows, cp) shard block."""
    rows, cp = u.shape
    itemsize = jnp.dtype(u.dtype).itemsize
    erows = rows + 2 * HALO
    strip, owned, num_strips = _strip_geometry(erows, rows, cp, itemsize)
    assert num_strips == 1 or owned >= HALO, (strip, owned)
    assert num_strips <= MAX_RDMA_STRIPS, (
        f"{num_strips} strips would unroll too large a program; raise the "
        f"VMEM budget or shard finer (rows/device = {rows})")
    assert steps <= HALO

    kernel = partial(_rdma_jacobi_kernel, n=n, rows=rows, cp=cp, steps=steps,
                     num_strips=num_strips, strip=strip, owned=owned,
                     h2=h * h, omega=omega, from_zero=from_zero, ndev=ndev,
                     axis_name=axis_name)

    if interpret is True:
        # the legacy boolean interpreter has no inter-device simulation;
        # the full TPU interpreter does (remote DMAs, semaphores, races)
        interpret = pltpu.InterpretParams(detect_races=True)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cp), u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, HALO, cp), u.dtype),    # received u halos
            pltpu.VMEM((2, HALO, cp), u.dtype),    # received f halos
            pltpu.VMEM((2, strip, cp), u.dtype),   # u load slots
            pltpu.VMEM((2, strip, cp), u.dtype),   # f load slots -> C
            pltpu.VMEM((strip, cp), u.dtype),      # ping-pong work buffer
            pltpu.VMEM((strip, cp), u.dtype),      # A coefficient
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),         # u send up/down
            pltpu.SemaphoreType.DMA((2,)),         # u recv up/down
            pltpu.SemaphoreType.DMA((2,)),         # f send up/down
            pltpu.SemaphoreType.DMA((2,)),         # f recv up/down
        ],
        compiler_params=pltpu.CompilerParams(
            # read the budget at call time: bench.py's auto-tune mutates
            # pk._VMEM_BUDGET_BYTES, and _strip_geometry above already sees
            # the tuned value — an import-by-value copy would diverge
            vmem_limit_bytes=2 * pk._VMEM_BUDGET_BYTES,
            # the neighbor barrier's semaphore (only allocated for real
            # rings; a 1-device "ring" skips the barrier and Mosaic rejects
            # a collective_id without one)
            collective_id=7 if ndev > 1 else None),
        interpret=interpret,
    )(meta, u, f)

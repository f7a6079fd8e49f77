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

Scope (round 5): ``halo="rdma"`` covers the 1-D ROW policy (2-D smoother +
whole-loop trigger) and, under the 3-D z-plane policy, the TRIGGER,
SMOOTHER, and BOTH FUSED LEGS (ops.pallas_rdma3: _rdma_jacobi3_kernel,
_rdma_descend3_kernel, _rdma_ascend3_kernel — plane-halo remote DMAs
overlapped with interior brick compute, err-fused, bit-matching the
ppermute paths; all engine-routed by compiled3). Remaining ppermute-only
3-D path: the odd-planes/device FALLBACK descend (sharded_smooth_residual3
+ einsum restriction) — aligned even-shard schedules never take it. The 2-D BLOCK policy's
128-lane column halos stay on the ppermute path — a DELIBERATE deferral,
not a hardware limit: the lane-direction DMA granularity law was probed on
hardware (examples/exp_lane_dma_probe.py, 2026-08-20) and (rows, 128)
lane slabs at ×128 offsets DMA fine (sub-128 widths and misaligned
offsets are rejected at lowering — the ×128 twin of the 8-row row law).
What a block-policy RDMA would additionally need is a 2-D ring protocol
(row + column neighbors) with a two-phase exchange so corner cells of the
k-sweep halo region arrive transitively (the ppermute path gets this by
exchanging the already-row-extended block). Modeled value is ~1.5% of a
cycle at 8 chips (ROADMAP) — below the complexity bar while real
multi-chip wall-clock remains unmeasurable; revisit with hardware.

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


def _remote_copy(src, dst, ss, rs, dev):
    """A ring remote-DMA descriptor (MESH device ids)."""
    return pltpu.make_async_remote_copy(
        src_ref=src, dst_ref=dst, send_sem=ss, recv_sem=rs,
        device_id=(dev,), device_id_type=pltpu.DeviceIdType.MESH)


def _ring_neighbors(my, ndev: int, loopback: bool):
    """(has_up, has_dn, up, dn) on the linear ring — or the loopback
    pseudo-ring where every neighbor is MYSELF (the one-chip
    hardware-validation mode, examples/exp_rdma_loopback.py)."""
    if loopback:
        t = my >= 0
        return t, t, my, my
    return (my > 0, my < ndev - 1,
            jnp.maximum(my - 1, 0), jnp.minimum(my + 1, ndev - 1))


def _allreduce_scalar(part, slot, errbuf, errtile, esend, erecv, my,
                      ndev: int, loopback: bool):
    """All-to-all a scalar partial (one nonzero element in an (8, 128)
    tile, parity ``slot`` per sweep) and return the exact global sum —
    the whole-loop trigger kernels' inter-sweep barrier (2-D and 3-D
    share this one implementation).

    The recv semaphores are PER SENDER (``erecv[s]``): each device waits
    for ONE arrival from EVERY peer. With a single shared semaphore the
    ndev−1 counts are fungible across senders, and on a ≥3-chip ring a
    fast peer's next-sweep signal can stand in for a slow peer's
    still-in-flight tile (a peer's multicast arrives at different times
    at different receivers), letting the wait pass with one slot stale or
    uninitialized. Per-sender counting plus per-channel DMA ordering
    makes the k-th arrival from a sender exactly its sweep-k tile; the
    parity slot keeps a one-ahead sender's write out of the slot being
    read. In ``loopback`` the sender impersonates each phantom peer d
    (writing errbuf[slot, d] / signaling erecv[d] on ITSELF) so the
    receiver-side counts match."""
    if ndev == 1:
        return part
    zi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    zj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    errtile[:] = jnp.where((zi == 0) & (zj == 0), part, jnp.float32(0.0))
    for s in range(ndev):
        @pl.when(my == _i32(s))
        def _(s=s):
            errbuf[slot, _i32(s)] = errtile[:]
            for d in range(ndev):
                if d != s:
                    si = d if loopback else s
                    _remote_copy(errtile.at[:], errbuf.at[slot, _i32(si)],
                                 esend.at[0], erecv.at[si],
                                 my if loopback else _i32(d)).start()
    for s in range(ndev):
        @pl.when(my != _i32(s))
        def _(s=s):
            _remote_copy(errtile.at[:], errbuf.at[slot, _i32(s)],
                         esend.at[0], erecv.at[s], _i32(0)).wait_recv()
    for _d in range(ndev - 1):
        _remote_copy(errtile.at[:], errbuf.at[slot, _i32(0)], esend.at[0],
                     erecv.at[0], _i32(0)).wait_send()
    tot = jnp.float32(0.0)
    for d in range(ndev):
        # exactly one nonzero per tile → the sum is the posted scalar
        tot = tot + jnp.sum(errbuf[slot, _i32(d)])
    return tot


def _rdma_jacobi_kernel(meta_smem, u_hbm, f_hbm, out_hbm,
                        hu, hf, u_slots, fc_slots, work, a_buf,
                        load_sems, out_sems, usend, urecv, fsend, frecv,
                        *, n: int, rows: int, cp: int, steps: int,
                        num_strips: int, strip: int, owned: int,
                        h2: float, omega: float, from_zero: bool,
                        ndev: int, axis_name: str,
                        loopback: bool = False):
    """One fused ≤8-sweep damped-Jacobi pass on a LOCAL (rows, cp) block,
    exchanging 8-row u/f halos with ring neighbors in-kernel.

    ``loopback``: the trigger kernels' hardware-validation mode — every
    ring neighbor is MYSELF, so one real chip EXECUTES the barrier, the
    halo sends and the recv-gated strip schedule (the plain ndev=1 ring
    lowers but never runs them); halos wrap my own edge rows.

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

    has_up, has_dn, up, dn = _ring_neighbors(my, ndev, loopback)

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
    remote = _remote_copy

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


def _rdma_trigger_kernel(meta_smem, u_hbm, f_hbm, out_hbm, stat_smem,
                         U, FC, A, SEL, errbuf, errtile,
                         sem, usend, urecv, esend, erecv, rsem,
                         *, n: int, rows: int, cp: int, h2: float,
                         omega: float, trigger: float, compat,
                         max_sweeps: int, ndev: int, axis_name: str,
                         loopback: bool = False):
    """The WHOLE error-trigger loop (MG_solver_CPU.cpp:194-240) across a
    ring of chips in ONE kernel per chip: the shard's iterate (halo-extended
    by HALO rows each side) and folded source stay VMEM-resident for the
    entire `|err_k − err_{k−1}| > trigger` loop; each sweep exchanges the
    fresh edge rows with ring neighbors via remote DMAs (8 rows — the
    Mosaic DMA-granularity floor, see exchange_u; only the innermost is
    read) and all-to-alls the scalar metric partial, which doubles as the
    inter-sweep barrier — zero kernel launches and zero XLA collectives
    per sweep.

    Race-freedom of the per-sweep protocol:
      * the sweep updates the FULL extended block in place, but A (and FC)
        are zero on every non-owned or non-interior row, so halo rows are
        left untouched by sweeps and carry exactly the neighbors' values;
      * a READY handshake precedes every halo send: each device signals its
        neighbors' regular semaphore right after committing its sweep (its
        own halo reads are done), and a sender blocks on that signal before
        writing — so fresh halos never land while the receiver still reads
        the previous ones (rsem[0] accumulates the UP neighbor's readiness,
        rsem[1] the DOWN's; I signal up's slot 1 and down's slot 0);
      * the metric tiles are PARITY double-buffered (errbuf[k % 2]) and
        their arrivals counted on PER-SENDER recv semaphores (see
        allreduce): a device one sweep ahead writes the other slot, it
        cannot be TWO ahead without having received this device's partials
        (posted only after the previous slot's read completed), and no
        peer's signal can stand in for another's still-in-flight tile.
    The all-to-all waits make every device take the same stop decision on
    the same global err. Stop rule, metrics and scaling mirror the
    per-pass engine path exactly.

    ``loopback`` (hardware-validation mode): pretend to sit on an
    ndev-ring whose every neighbor is MYSELF — all remote device ids
    become ``my`` and the all-to-all impersonates each phantom peer —
    so ONE real chip Mosaic-compiles and EXECUTES the complete protocol
    (barrier, READY handshake, sub-tile edge DMAs, per-sender-semaphore
    all-to-all, parity buffers). Deterministic semantics: halos wrap my
    own edges, the global err is ndev x my partial; the hardware result
    must BIT-match the interpreter running the same loopback config
    (examples/exp_rdma_loopback.py)."""
    row0 = meta_smem[0]
    col0 = meta_smem[1]
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    erows = rows + 2 * HALO

    has_up, has_dn, up, dn = _ring_neighbors(my, ndev, loopback)
    dtype = u_hbm.dtype

    # zero BOTH halo rings BEFORE the barrier: only the innermost halo row
    # ever feeds the sweeps/metric, but uninitialized outer rows would leak
    # NaN through the masked metric (0·NaN). Pre-barrier is what makes the
    # unconditional (tile-aligned) store race-free — a neighbor's remote
    # write into the innermost row can only start after it passes ITS
    # barrier, which needs this device's signal below.
    U[0:HALO] = jnp.zeros((HALO, cp), dtype)
    U[erows - HALO:erows] = jnp.zeros((HALO, cp), dtype)

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

    remote = _remote_copy

    # park the shard into the extended buffers. A is local-only, so its
    # halo staging rows are zeroed unconditionally (0·h²·0 keeps FC's
    # halos NaN-free).
    A[0:HALO] = jnp.zeros((HALO, cp), dtype)
    A[erows - HALO:erows] = jnp.zeros((HALO, cp), dtype)
    cp_u = pltpu.make_async_copy(u_hbm, U.at[pl.ds(HALO, rows)], sem)
    cp_u.start()
    cp_u.wait()
    # stage f through A (overwritten below) to keep one buffer
    cp_f = pltpu.make_async_copy(f_hbm, A.at[pl.ds(HALO, rows)], sem)
    cp_f.start()
    cp_f.wait()

    # masks on the EXTENDED block: a is zero on halo rows (sweeps then
    # leave them carrying exactly the neighbors' values), on the global
    # Dirichlet ring and on padding; FC inherits the zeros. The metric
    # mask restricts to owned interior (+ the even color for "cpu").
    riota = jax.lax.broadcasted_iota(jnp.int32, (erows, cp), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (erows, cp), 1)
    g = riota - HALO + row0
    gc = ciota + col0
    owned = (riota >= HALO) & (riota < HALO + rows)
    ok = (owned & (g >= 1) & (g <= n - 2) & (gc >= 1) & (gc <= n - 2))
    A_full = jnp.where(ok, jnp.float32(0.25 * omega),
                       jnp.float32(0.0)).astype(dtype)
    fraw = A[:]
    FC[:] = A_full * (jnp.asarray(h2, dtype) * fraw)
    A[:] = A_full
    if compat == "cpu":
        selv = ok & ((g + gc) % 2 == 0)
    else:
        selv = ok
    SEL[:] = jnp.where(selv, jnp.float32(1.0), jnp.float32(0.0)
                       ).astype(dtype)

    if compat == "gpu":
        scale = 4.0 / h2 / (n * n)
    else:
        scale = (4.0 / (omega * h2) / (n * n)
                 * (2.0 if compat == "cpu" else 1.0))

    def exchange_u(handshake: bool):
        """Send my HALO edge rows to the neighbors' halo rings and wait
        for theirs. Only the INNERMOST halo row is ever read (one Jacobi
        update per sweep; A and FC are zero on all halo rows and the
        metric masks to owned), but HALO=8 rows is the MINIMUM
        Mosaic-expressible transfer: VMEM DMA slices must be 8-row
        aligned in offset AND size for (8,128)-tiled f32 refs — a (1, cp)
        edge-row copy is rejected at lowering ("Slice shape along
        dimension 0 must be aligned to tiling (8), but is 1"; probed on
        hardware via the loopback mode, exp_rdma_loopback.py). The 3-D
        twin ships single planes only because its leading z dim is
        untiled. With ``handshake``, block each send on the receiver's
        READY signal (see the docstring)."""
        if handshake:
            @pl.when(has_up)
            def _():
                pltpu.semaphore_signal(
                    rsem.at[1], 1, device_id=(up,),
                    device_id_type=pltpu.DeviceIdType.MESH)

            @pl.when(has_dn)
            def _():
                pltpu.semaphore_signal(
                    rsem.at[0], 1, device_id=(dn,),
                    device_id_type=pltpu.DeviceIdType.MESH)

            @pl.when(has_up)
            def _():
                pltpu.semaphore_wait(rsem.at[0], 1)

            @pl.when(has_dn)
            def _():
                pltpu.semaphore_wait(rsem.at[1], 1)

        su = remote(U.at[pl.ds(HALO, HALO)],
                    U.at[pl.ds(erows - HALO, HALO)],
                    usend.at[0], urecv.at[0], up)
        sd = remote(U.at[pl.ds(rows, HALO)], U.at[pl.ds(0, HALO)],
                    usend.at[1], urecv.at[1], dn)

        @pl.when(has_up)
        def _():
            su.start()

        @pl.when(has_dn)
        def _():
            sd.start()

        @pl.when(has_up)
        def _():
            # my top halo arrives from the UP neighbor's sd channel
            remote(U.at[pl.ds(rows, HALO)], U.at[pl.ds(0, HALO)],
                   usend.at[1], urecv.at[1], dn).wait_recv()

        @pl.when(has_dn)
        def _():
            remote(U.at[pl.ds(HALO, HALO)],
                   U.at[pl.ds(erows - HALO, HALO)],
                   usend.at[0], urecv.at[0], up).wait_recv()

        @pl.when(has_up)
        def _():
            su.wait_send()

        @pl.when(has_dn)
        def _():
            sd.wait_send()

    if ndev > 1:
        exchange_u(handshake=False)    # initial: nobody reads halos yet

    def sweep_val(u):
        return u + A[:] * (_nb_sum(u, erows, cp) - 4.0 * u) - FC[:]

    def msum(v):
        v = jnp.abs(v).astype(jnp.float32)
        s = SEL[:].astype(jnp.float32)
        return jnp.sum(s * v)

    def allreduce(part, slot):
        """Per-sender-semaphore scalar all-to-all — see _allreduce_scalar
        (shared with the 3-D kernel)."""
        return _allreduce_scalar(part, slot, errbuf, errtile, esend,
                                 erecv, my, ndev, loopback)

    def step(k):
        u_old = U[:]
        u_new = sweep_val(u_old)
        # commit OWNED rows only: sweeps never touch the halo rings, which
        # belong exclusively to the neighbors' remote writes (writing the
        # full buffer would be a same-value but still racing write)
        U[pl.ds(HALO, rows)] = u_new[HALO:HALO + rows, :]
        if ndev > 1:
            exchange_u(handshake=True)
        if compat == "gpu":
            part = msum(u_new - u_old)
        else:
            # extra in-VMEM Δ of the NEW iterate (fresh halos just arrived)
            fin = U[:]
            part = msum(A[:] * (_nb_sum(fin, erows, cp) - 4.0 * fin)
                        - FC[:])
        return allreduce(part, jax.lax.rem(k, _i32(2))) \
            * jnp.float32(scale)

    err0 = step(_i32(1))

    def cond(carry):
        _, slope, k = carry
        return jnp.logical_and(slope > trigger, k < max_sweeps)

    def body(carry):
        prev, _, k = carry
        err = step(k + 1)
        return err, jnp.abs(err - prev), k + 1

    err, _, k = jax.lax.while_loop(
        cond, body, (err0, jnp.float32(trigger + 1.0), jnp.int32(1)))
    stat_smem[0, 0] = err
    stat_smem[0, 1] = k.astype(jnp.float32)

    cp_out = pltpu.make_async_copy(U.at[pl.ds(HALO, rows)], out_hbm, sem)
    cp_out.start()
    cp_out.wait()


def rdma_trigger_fits(rows: int, cp: int, itemsize: int = 4) -> bool:
    """Per-shard residency bound: U + FC + A + SEL extended buffers plus
    sweep temporaries inside ~112 MiB."""
    erows = rows + 2 * HALO
    return 7 * erows * cp * itemsize <= 112 * 1024 * 1024


def _rdma_trigger_shard_call(meta, u, f, n: int, h: float, trigger: float,
                             omega: float, compat, max_sweeps: int,
                             ndev: int, interpret,
                             axis_name: str = "rows",
                             loopback: bool = False):
    """The whole trigger loop on a LOCAL (rows, cp) shard block (see
    _rdma_trigger_kernel); returns (u_new, err)."""
    rows, cp = u.shape
    erows = rows + 2 * HALO
    assert rdma_trigger_fits(rows, cp, jnp.dtype(u.dtype).itemsize)
    # normalize the engine's compat flag (True/False/"gpu") to the kernel's
    # err-mode strings — True must select the cpu color-bug mask, not fall
    # through to clean-with-cpu-scale
    mode = ("gpu" if compat == "gpu"
            else "cpu" if (compat is True or compat == "cpu") else "clean")
    kernel = partial(_rdma_trigger_kernel, n=n, rows=rows, cp=cp, h2=h * h,
                     omega=omega, trigger=trigger, compat=mode,
                     max_sweeps=max_sweeps, ndev=ndev, axis_name=axis_name,
                     loopback=loopback)

    if interpret is True:
        interpret = pltpu.InterpretParams(detect_races=True)

    out, stat = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, cp), u.dtype),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((erows, cp), u.dtype),       # U (extended iterate)
            pltpu.VMEM((erows, cp), u.dtype),       # FC
            pltpu.VMEM((erows, cp), u.dtype),       # A (stages f first)
            pltpu.VMEM((erows, cp), u.dtype),       # SEL metric mask
            pltpu.VMEM((2, ndev, 8, 128), jnp.float32),  # err tiles (parity)
            pltpu.VMEM((8, 128), jnp.float32),      # my posted tile
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),          # u send up/down
            pltpu.SemaphoreType.DMA((2,)),          # u recv up/down
            pltpu.SemaphoreType.DMA((1,)),          # err send
            pltpu.SemaphoreType.DMA((ndev,)),       # err recv, PER SENDER
            pltpu.SemaphoreType.REGULAR((2,)),      # READY handshake up/dn
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            collective_id=9 if ndev > 1 else None),
        interpret=interpret,
    )(meta, u, f)
    return out, stat[0, 0].astype(u.dtype)


def _rdma_jacobi_shard_call(meta, u, f, n: int, h: float, steps: int,
                            omega: float, from_zero: bool, ndev: int,
                            interpret, axis_name: str = "rows",
                            loopback: bool = False):
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
                     axis_name=axis_name, loopback=loopback)

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

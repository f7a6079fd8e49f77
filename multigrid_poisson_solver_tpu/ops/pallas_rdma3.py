"""3-D multi-chip whole-loop RDMA trigger: the ENTIRE error-trigger loop
(MG_solver_CPU.cpp:194-240, one dimension up) across a ring of chips in ONE
kernel per chip, under the z-plane decomposition.

The 3-D member of the ops.pallas_rdma family: each shard's z-plane block of
the iterate (halo-extended by ONE plane each side) and its folded source
a·h²·f stay VMEM-resident for the entire ``|err_k − err_{k−1}| > trigger``
loop. Per sweep:

  * the owned planes update IN PLACE with the one-plane wavefront of
    ops.pallas3d._trigger3_stream_kernel (an edge buffer carries the
    pre-update plane t−1; halo planes are never written by sweeps — they
    belong exclusively to the neighbors' remote DMAs);
  * the two fresh edge planes move by READY-handshaked remote DMAs
    (``pltpu.make_async_remote_copy``): each device signals its neighbors'
    regular semaphore after committing its sweep (its halo reads are done)
    and senders block on it, so fresh halos never land while the receiver
    still reads the previous ones;
  * the scalar metric partial moves by an in-kernel all-to-all of
    parity-double-buffered (8, 128) tiles that doubles as the inter-sweep
    barrier (a device cannot run two sweeps ahead without this device's
    posted partial).

Zero kernel launches and zero XLA collectives per sweep — the per-pass
sharded 3-D trigger pays a dispatch + plane ppermutes + a psum each sweep.

Unlike the 2-D kernel (whole-block sweeps → A must be zeroed on halo rows),
the wavefront writes owned planes only, so no coefficient staging on halos
is needed and the folded source is stored for OWNED planes alone: residency
is ~2 volumes/shard ((nl+2) + nl planes), admitting ~50 planes/shard of the
385³ class on 8 chips (``rdma_trigger3_fits``).

Validation (the round-3/4 RDMA acceptance bar, tests/test_rdma.py):
BIT-match vs the per-pass sharded loop on the race-detecting 4-device
interpreter mesh for both 3-D metrics (8-device interpreter runs hit the
documented _allocate_buffer io_callback deadlock — an interpreter
artifact), engine routing via SolverConfig(halo="rdma") under a
ZShardingPolicy3 (compiled3.trigger_p), and the COMPLETE protocol
Mosaic-compiled + executed on real hardware in loopback mode
(examples/exp_rdma_loopback.py: interpreter agreement to 1.2e-7, re-runs
bit-identical). No real multi-chip ring exists here; wall-clock gains
need one."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _i32
from .pallas_rdma import _allreduce_scalar, _remote_copy, _ring_neighbors
from .pallas3d import _nb_sum


def rdma_trigger3_fits(nl: int, rp: int, cp: int,
                       itemsize: int = 4) -> bool:
    """Per-shard residency bound: U ext ((nl+2) planes) + FC (nl planes)
    + wavefront/metric temporaries inside ~112 MiB."""
    plane = rp * cp * itemsize
    return (2 * nl + 2 + 6) * plane <= 112 * 1024 * 1024


def _rdma_trigger3_kernel(u_hbm, f_hbm, out_hbm, stat_smem,
                          U, FC, edge, errbuf, errtile,
                          sem, usend, urecv, esend, erecv, rsem,
                          *, n: int, nl: int, rp: int, cp: int, h2: float,
                          omega: float, trigger: float, compat,
                          max_sweeps: int, ndev: int, axis_name: str,
                          loopback: bool = False):
    """See the module docstring. U holds (nl + 2, rp, cp): plane 0 = top
    halo (global z0 − 1), planes 1..nl owned (z0 = my·nl), plane nl + 1 =
    bottom halo. FC[t−1] is the owned plane t's folded source.

    ``loopback``: the 2-D kernel's hardware-validation mode one dimension
    up — every neighbor is MYSELF, so one real chip executes the complete
    protocol; bit-compare against the interpreter on the same config."""
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    z0 = my * nl

    has_up, has_dn, up, dn = _ring_neighbors(my, ndev, loopback)
    dtype = u_hbm.dtype

    # --- neighbor barrier: nobody writes into a neighbor's halo planes
    # --- until that neighbor has entered this kernel instance ------------
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

    # park the shard: owned planes into U[1..nl]; halo planes are zeroed
    # ONLY on neighborless sides (zero keeps 0·NaN out of the frozen
    # boundary sums; sides WITH a neighbor receive their plane from the
    # initial exchange — writing them here would race the neighbor's
    # post-barrier remote write, the round-4 2-D lesson)
    @pl.when(jnp.logical_not(has_up))
    def _():
        U[0] = jnp.zeros((rp, cp), dtype)

    @pl.when(jnp.logical_not(has_dn))
    def _():
        U[nl + 1] = jnp.zeros((rp, cp), dtype)

    cp_u = pltpu.make_async_copy(u_hbm, U.at[pl.ds(1, nl)], sem)
    cp_u.start()
    cp_u.wait()
    cp_f = pltpu.make_async_copy(f_hbm, FC, sem)
    cp_f.start()
    cp_f.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 1)
    ok2d = ((rows >= 1) & (rows <= n - 2) & (cols >= 1) & (cols <= n - 2))
    w = jnp.asarray(omega / 6.0, dtype)
    a2d = jnp.where(ok2d, w, jnp.zeros((rp, cp), dtype))
    h2c = jnp.asarray(h2, dtype)

    def ap(t):
        """Coefficient plane of ext index t (global z = z0 + t − 1)."""
        gz = z0 + t - 1
        gate = jnp.where((gz >= 1) & (gz <= n - 2),
                         jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
        return a2d * gate

    # fold the source in place: FC[t−1] = a(t)·h²·f (zero on every frozen
    # plane/row/lane, so sweeps never need a separate mask there)
    def fold(t, c):
        FC[t - 1] = ap(t) * (h2c * FC[t - 1])
        return c

    jax.lax.fori_loop(_i32(1), _i32(nl + 1), fold, _i32(0), unroll=False)

    if compat == "gpu":
        scale = 6.0 / h2 / (n ** 3)
    else:
        scale = 6.0 / (omega * h2) / (n ** 3)

    def masked_plane_sum(t, val):
        gz = z0 + t - 1
        gate = jnp.where((gz >= 1) & (gz <= n - 2),
                         jnp.float32(1.0), jnp.float32(0.0))
        v = jnp.abs(val).astype(jnp.float32)
        return gate * jnp.sum(jnp.where(ok2d, v, jnp.zeros_like(v)))

    def exchange_u(handshake: bool):
        """Send my fresh edge planes to the neighbors' halo planes and
        wait for theirs; with ``handshake``, block each send on the
        receiver's READY signal (its halo reads are done)."""
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

        su = remote(U.at[pl.ds(1, 1)], U.at[pl.ds(nl + 1, 1)],
                    usend.at[0], urecv.at[0], up)
        sd = remote(U.at[pl.ds(nl, 1)], U.at[pl.ds(0, 1)],
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
            remote(U.at[pl.ds(nl, 1)], U.at[pl.ds(0, 1)],
                   usend.at[1], urecv.at[1], dn).wait_recv()

        @pl.when(has_dn)
        def _():
            remote(U.at[pl.ds(1, 1)], U.at[pl.ds(nl + 1, 1)],
                   usend.at[0], urecv.at[0], up).wait_recv()

        @pl.when(has_up)
        def _():
            su.wait_send()

        @pl.when(has_dn)
        def _():
            sd.wait_send()

    if ndev > 1:
        exchange_u(handshake=False)     # initial: nobody reads halos yet

    def allreduce(part, slot):
        """Per-sender-semaphore scalar all-to-all — doubles as the
        inter-sweep barrier; shared implementation with the 2-D kernel
        (pallas_rdma._allreduce_scalar)."""
        return _allreduce_scalar(part, slot, errbuf, errtile, esend,
                                 erecv, my, ndev, loopback)

    def step(k):
        # --- in-place wavefront sweep of the OWNED planes (halo planes
        # --- belong exclusively to the neighbors' remote writes) ---------
        edge[:] = U[0]

        def plane(t, acc):
            um = edge[:]
            u = U[t]
            upl = U[t + 1]
            nb = _nb_sum(u, rp, cp) + um + upl - 6.0 * u
            unew = u + ap(t) * nb - FC[t - 1]
            edge[:] = u
            U[t] = unew
            if compat == "gpu":
                acc = acc + masked_plane_sum(t, unew - u)
            return acc

        part = jax.lax.fori_loop(_i32(1), _i32(nl + 1), plane,
                                 jnp.zeros((), jnp.float32), unroll=False)
        if ndev > 1:
            exchange_u(handshake=True)
        if compat != "gpu":
            # clean metric of the NEW iterate (extra-Δ identity) on the
            # fresh halos that just arrived
            def rplane(t, acc):
                u = U[t]
                nb = _nb_sum(u, rp, cp) + U[t - 1] + U[t + 1] - 6.0 * u
                d = ap(t) * nb - FC[t - 1]
                return acc + masked_plane_sum(t, d)

            part = jax.lax.fori_loop(_i32(1), _i32(nl + 1), rplane,
                                     jnp.zeros((), jnp.float32),
                                     unroll=False)
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

    cp_out = pltpu.make_async_copy(U.at[pl.ds(1, nl)], out_hbm, sem)
    cp_out.start()
    cp_out.wait()


def _rdma_trigger3_shard_call(u, f, n: int, h: float, trigger: float,
                              omega: float, compat, max_sweeps: int,
                              ndev: int, interpret,
                              axis_name: str = "z", loopback: bool = False):
    """The whole 3-D trigger loop on a LOCAL (nl, rp, cp) z-plane shard
    block (see _rdma_trigger3_kernel); returns (u_new, err)."""
    nl, rp, cp = u.shape
    assert rdma_trigger3_fits(nl, rp, cp, jnp.dtype(u.dtype).itemsize)
    mode = "gpu" if compat == "gpu" else "clean"
    kernel = partial(_rdma_trigger3_kernel, n=n, nl=nl, rp=rp, cp=cp,
                     h2=h * h, omega=omega, trigger=trigger, compat=mode,
                     max_sweeps=max_sweeps, ndev=ndev, axis_name=axis_name,
                     loopback=loopback)

    if interpret is True:
        interpret = pltpu.InterpretParams(detect_races=True)

    out, stat = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nl, rp, cp), u.dtype),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((nl + 2, rp, cp), u.dtype),   # U (ext iterate)
            pltpu.VMEM((nl, rp, cp), u.dtype),       # FC (owned planes)
            pltpu.VMEM((rp, cp), u.dtype),           # wavefront edge plane
            pltpu.VMEM((2, ndev, 8, 128), jnp.float32),  # err tiles (parity)
            pltpu.VMEM((8, 128), jnp.float32),       # my posted tile
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),           # u send up/down
            pltpu.SemaphoreType.DMA((2,)),           # u recv up/down
            pltpu.SemaphoreType.DMA((1,)),           # err send
            pltpu.SemaphoreType.DMA((ndev,)),        # err recv, PER SENDER
            pltpu.SemaphoreType.REGULAR((2,)),       # READY handshake up/dn
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            collective_id=11 if ndev > 1 else None),
        interpret=interpret,
    )(u, f)
    return out, stat[0, 0].astype(u.dtype)


# --- RDMA halo-overlap SMOOTHER (round 5) -------------------------------------
#
# The 3-D member of ops.pallas_rdma._rdma_jacobi_kernel: one fused ≤8-sweep
# pass on a bare (nl, rp, cp) z-plane shard, exchanging ext-plane u/f halos
# with the ring neighbors by in-kernel remote DMA and smoothing INTERIOR
# (z,row) bricks while the wires are busy — only the (at most two) z-edge
# brick groups wait on the receive semaphores. Replaces the per-pass
# lax.ppermute BARRIER of parallel.pallas_shard3.sharded_fused_jacobi3:
# same trapezoid-staleness semantics, bit-matching iterates (per-point
# expression trees are identical; brick geometry does not reassociate).
# The predicted 30% wire share of the 8-chip 513³ cycle
# (utils.scaling_model3, BASELINE "Predicted 3-D z-plane scaling") is
# exactly this traffic.

RDMA3_BRICK_BUDGET = 40 * 1024 * 1024
MAX_RDMA3_BRICKS = 32


def _rdma_jacobi3_geometry(nl: int, rp: int, cp: int, ext: int,
                           itemsize: int = 4):
    from .pallas3d import _brick_geometry
    import math

    nz_e = nl + 2 * ext
    zs, rs, oz, orow = _brick_geometry(nz_e, rp, cp, itemsize, z_halo=ext,
                                       num_bufs=6.0,
                                       budget=RDMA3_BRICK_BUDGET)
    oz = nl if zs >= nz_e else min(oz, nl)
    num_zb = math.ceil(nl / oz) if zs < nz_e else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1
    return zs, rs, oz, orow, num_zb, num_rb


def rdma_jacobi3_fits(nl: int, rp: int, cp: int, steps: int,
                      itemsize: int = 4, err: bool = False) -> bool:
    """Admission: the ext-plane halo buffers (u+f, both sides) plus the
    brick working set inside the VMEM part, and the static brick schedule
    inside the unroll cap. ``err`` (clean metric) burns one extra ring."""
    ext = steps + (1 if err else 0)
    if ext > min(nl, 8) or steps < 1:
        return False
    plane = rp * cp * itemsize
    try:
        zs, rs, _, _, num_zb, num_rb = _rdma_jacobi3_geometry(
            nl, rp, cp, ext, itemsize)
    except ValueError:
        return False
    total = 4 * ext * plane + 6 * zs * rs * cp * itemsize
    return (num_zb * num_rb <= MAX_RDMA3_BRICKS
            and total + 16 * 1024 * 1024 <= 126 * 1024 * 1024)



def _static_brick_schedule(nl: int, ext: int, zs: int, oz: int, orow: int,
                           rp: int, rs: int, num_zb: int, num_rb: int,
                           r_halo: int, extra_interior=None):
    """The SHARED static window/schedule math of the RDMA brick kernels
    (smoother r_halo=8, descend r_halo=8, ascend r_halo=16 — the review
    found the one hand-copied offset that drifted). Returns
    (zwin, rwin, order): zwin(i) -> (wz, z0, top_ov, bot_ov) over the
    virtual extended depth nl + 2·ext; rwin(j) -> (r0, wr) with the
    geometry's row-halo load offset; order = interior-z-first brick list
    (``extra_interior(i)`` may veto interior status, e.g. for coarse
    windows that touch their own halos)."""
    nz_e = nl + 2 * ext

    def zwin(i: int):
        wz = min(i * oz, nl - oz) if num_zb > 1 else 0
        z0 = min(max(wz, 0), nz_e - zs)
        top_ov = max(0, ext - z0)
        bot_ov = max(0, z0 + zs - (ext + nl))
        return wz, z0, top_ov, bot_ov

    def rwin(j: int):
        r0 = min(max(j * orow - r_halo, 0), rp - rs) if num_rb > 1 else 0
        r0 = (r0 // 8) * 8
        wr = min(j * orow, rp - orow) if num_rb > 1 else 0
        return r0, wr

    bricks = [(i, j) for i in range(num_zb) for j in range(num_rb)]

    def is_interior(b):
        if zwin(b[0])[2] or zwin(b[0])[3]:
            return False
        return extra_interior(b[0]) if extra_interior else True

    interior = [b for b in bricks if is_interior(b)]
    order = interior + [b for b in bricks if b not in interior]
    assert len(order) <= MAX_RDMA3_BRICKS
    return zwin, rwin, order


def _rdma_jacobi3_kernel(u_hbm, f_hbm, *rest,
                         n: int, nl: int, rp: int, cp: int, steps: int,
                         ext: int, zs: int, rs: int, oz: int, orow: int,
                         num_zb: int, num_rb: int, h2: float, omega: float,
                         from_zero: bool, ndev: int, axis_name: str,
                         err_mode=None, loopback: bool = False):
    """See the section comment. hu/hf hold [0] = top halo (extended planes
    [0, ext) — the UP neighbor's last owned planes) and [1] = bottom halo;
    the owned block spans extended planes [ext, ext + nl). The brick
    schedule is STATIC (python-unrolled, ≤ MAX_RDMA3_BRICKS) with interior
    z-bricks first, so every halo splice is a static slice and boundary
    bricks are the only ones gated on the receive semaphores.

    ``err_mode`` ("clean"/"gpu") fuses the smoothing-error partial of the
    final iterate over OWNED interior cells into the pass (the fused
    kernel's own-masked reduction); clean's extra in-VMEM residual sweep
    consumes one halo ring, so ext = steps + 1 there. The raw
    metric-scaled partial lands in a (1, 1) SMEM output — the wrapper
    psums it across the ring."""
    from .pallas3d import _plane_sweep

    if err_mode is not None:
        out_hbm, err_smem = rest[:2]
        rest = rest[2:]
    else:
        out_hbm = rest[0]
        rest = rest[1:]
    (hu, hf, u_slots, fc_slots, work, a_buf,
     load_sems, out_sems, usend, urecv, fsend, frecv) = rest

    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    nz_e = nl + 2 * ext
    zoff = my * nl - ext               # global z of extended plane 0
    dtype = u_hbm.dtype

    has_up, has_dn, up, dn = _ring_neighbors(my, ndev, loopback)

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
    # channel convention (the 2-D kernel's, one dimension up): my FIRST ext
    # owned planes are the up neighbor's BOTTOM halo (its hu[1], channel 0);
    # my LAST ext planes are the down neighbor's TOP halo (its hu[0],
    # channel 1) — so MY hu[1] arrives on urecv[0], MY hu[0] on urecv[1]
    fu = remote(f_hbm.at[pl.ds(0, ext)], hf.at[1], fsend.at[0],
                frecv.at[0], up)
    fd = remote(f_hbm.at[pl.ds(nl - ext, ext)], hf.at[0], fsend.at[1],
                frecv.at[1], dn)
    if not from_zero:
        # built only when started: an unstarted descriptor trips the
        # interpreter's unused-copy check on from_zero passes
        su = remote(u_hbm.at[pl.ds(0, ext)], hu.at[1], usend.at[0],
                    urecv.at[0], up)
        sd = remote(u_hbm.at[pl.ds(nl - ext, ext)], hu.at[0], usend.at[1],
                    urecv.at[1], dn)

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

    @pl.when(jnp.logical_not(has_up))
    def _():
        hf[0] = jnp.zeros((ext, rp, cp), dtype)
        if not from_zero:
            hu[0] = jnp.zeros((ext, rp, cp), dtype)

    @pl.when(jnp.logical_not(has_dn))
    def _():
        hf[1] = jnp.zeros((ext, rp, cp), dtype)
        if not from_zero:
            hu[1] = jnp.zeros((ext, rp, cp), dtype)

    # --- static brick schedule, interior-z bricks first -------------------
    zwin, rwin, order = _static_brick_schedule(
        nl, ext, zs, oz, orow, rp, rs, num_zb, num_rb, r_halo=8)

    def load_copies(i: int, j: int, slot):
        _, z0, top_ov, bot_ov = zwin(i)
        r0, _ = rwin(j)
        body = zs - top_ov - bot_ov
        copies = (pltpu.make_async_copy(
            f_hbm.at[pl.ds(z0 + top_ov - ext, body), pl.ds(r0, rs), :],
            fc_slots.at[slot, pl.ds(top_ov, body)],
            load_sems.at[slot, _i32(1)]),)
        if not from_zero:
            copies += (pltpu.make_async_copy(
                u_hbm.at[pl.ds(z0 + top_ov - ext, body), pl.ds(r0, rs), :],
                u_slots.at[slot, pl.ds(top_ov, body)],
                load_sems.at[slot, _i32(0)]),)
        return copies

    def out_copy(i: int, j: int, slot):
        wz, z0, _, _ = zwin(i)
        r0, wr = rwin(j)
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wz + ext - z0, oz),
                       pl.ds(wr - r0, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    waited = {"top": False, "bot": False}

    def splice_halos(i: int, j: int, slot):
        _, z0, top_ov, bot_ov = zwin(i)
        r0, _ = rwin(j)
        if top_ov:
            if not waited["top"]:
                waited["top"] = True

                @pl.when(has_up)
                def _():
                    fd_in = remote(f_hbm.at[pl.ds(nl - ext, ext)], hf.at[0],
                                   fsend.at[1], frecv.at[1], dn)
                    fd_in.wait_recv()
                    if not from_zero:
                        sd_in = remote(u_hbm.at[pl.ds(nl - ext, ext)],
                                       hu.at[0], usend.at[1], urecv.at[1],
                                       dn)
                        sd_in.wait_recv()
            for t in range(top_ov):
                hfp = hf[0, z0 + t]
                fc_slots[slot, t] = hfp[r0:r0 + rs, :]
                if not from_zero:
                    hup = hu[0, z0 + t]
                    u_slots[slot, t] = hup[r0:r0 + rs, :]
        if bot_ov:
            if not waited["bot"]:
                waited["bot"] = True

                @pl.when(has_dn)
                def _():
                    fu_in = remote(f_hbm.at[pl.ds(0, ext)], hf.at[1],
                                   fsend.at[0], frecv.at[0], up)
                    fu_in.wait_recv()
                    if not from_zero:
                        su_in = remote(u_hbm.at[pl.ds(0, ext)], hu.at[1],
                                       usend.at[0], urecv.at[0], up)
                        su_in.wait_recv()
            for t in range(bot_ov):
                te = zs - bot_ov + t             # brick-local plane
                ze = z0 + te - (ext + nl)        # bottom-halo plane index
                hfp = hf[1, ze]
                fc_slots[slot, te] = hfp[r0:r0 + rs, :]
                if not from_zero:
                    hup = hu[1, ze]
                    u_slots[slot, te] = hup[r0:r0 + rs, :]

    for cp_ in load_copies(*order[0], _i32(0)):
        cp_.start()

    w = jnp.asarray(omega / 6.0, dtype)
    h2c = jnp.asarray(h2, dtype)
    n_sweeps = steps - 1 if from_zero else steps
    total = jnp.zeros((), jnp.float32)
    s_clean = abs(6.0 / (omega * h2))
    s_gpu = abs(6.0 / h2)

    for p, (i, j) in enumerate(order):
        slot = _i32(p % 2)
        nxt = _i32((p + 1) % 2)

        if p + 1 < len(order):
            if p >= 1:
                out_copy(*order[p - 1], nxt).wait()
            for cp_ in load_copies(*order[p + 1], nxt):
                cp_.start()

        for cp_ in load_copies(i, j, slot):
            cp_.wait()
        splice_halos(i, j, slot)

        _, z0, _, _ = zwin(i)
        r0, _ = rwin(j)

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows_i + r0
        ok = ((g >= 1) & (g <= n - 2) & (cols_i >= 1) & (cols_i <= n - 2)
              & (rows_i >= 1) & (rows_i <= rs - 2))
        a_plane = jnp.where(ok, w, jnp.zeros_like(w)).astype(dtype)

        def build_plane(t, c, z0=z0, g=g, cols_i=cols_i,
                        a_plane=a_plane, slot=slot):
            gz = zoff + _i32(z0) + t
            gate = (gz >= 1) & (gz <= n - 2) & (t > 0) & (t < zs - 1)
            ap = jnp.where(gate, a_plane, jnp.zeros_like(a_plane))
            a_buf[t] = ap
            raw_f = fc_slots[slot, t]
            fc_slots[slot, t] = ap * (h2c * raw_f)
            if from_zero:
                okg = ((g >= 1) & (g <= n - 2)
                       & (cols_i >= 1) & (cols_i <= n - 2)
                       & (gz >= 1) & (gz <= n - 2))
                u_slots[slot, t] = jnp.where(
                    okg, -(w * (h2c * raw_f)), jnp.zeros((rs, cp), dtype))
            return c

        jax.lax.fori_loop(_i32(0), _i32(zs), build_plane, _i32(0),
                          unroll=False)

        def read_u(t, slot=slot):
            return u_slots[slot, t]

        def write_u(t, v, slot=slot):
            u_slots[slot, t] = v

        def read_w(t):
            return work[t]

        def write_w(t, v):
            work[t] = v

        accessors = [(read_u, write_u), (read_w, write_w)]

        def sweep(rd, wr_, slot=slot):
            _plane_sweep(rd, wr_, lambda t: a_buf[t],
                         lambda t: fc_slots[slot, t], zs, rs, cp)

        for s in range(n_sweeps):
            sweep(accessors[s % 2][0], accessors[(s + 1) % 2][1])

        if err_mode is not None:
            # exact (non-overlapping) ownership for the reduction — the
            # fused kernel's own_mask with STATIC brick windows
            own_r = ((g >= j * orow) & (g < min((j + 1) * orow, rp))
                     & (g >= 1) & (g <= n - 2)
                     & (cols_i >= 1) & (cols_i <= n - 2))
            olo, ohi = i * oz, min((i + 1) * oz, nl)

            def own_mask(t, z0=z0, own_r=own_r):
                gz = zoff + _i32(z0) + t
                o = z0 + t - ext
                return (own_r & (gz >= 1) & (gz <= n - 2)
                        & (o >= olo) & (o < ohi))

            def own_sum(val_fn):
                def plane_(t, a2):
                    val = val_fn(t).astype(jnp.float32)
                    return a2 + jnp.sum(jnp.where(own_mask(t), val,
                                                  jnp.zeros_like(val)))

                return jax.lax.fori_loop(_i32(1), _i32(zs - 1), plane_,
                                         jnp.zeros((), jnp.float32),
                                         unroll=False)

            rd_fin = accessors[n_sweeps % 2][0]
            if err_mode == "clean":
                def val(t, slot=slot, rd_fin=rd_fin):
                    u = rd_fin(t)
                    nb = (_nb_sum(u, rs, cp) + rd_fin(t - 1)
                          + rd_fin(t + 1) - 6.0 * u)
                    return jnp.abs(a_buf[t] * nb - fc_slots[slot, t])

                total = total + own_sum(val) * s_clean
            else:
                rd_prev = accessors[(n_sweeps - 1) % 2][0]
                if from_zero and n_sweeps == 0:
                    def dval(t, rd_fin=rd_fin):
                        return jnp.abs(rd_fin(t))
                else:
                    def dval(t, rd_fin=rd_fin, rd_prev=rd_prev):
                        return jnp.abs(rd_fin(t) - rd_prev(t))

                total = total + own_sum(dval) * s_gpu

        if n_sweeps % 2 == 1:
            def copy_back(t, c, slot=slot):
                u_slots[slot, t] = work[t]
                return c

            jax.lax.fori_loop(_i32(0), _i32(zs), copy_back, _i32(0),
                              unroll=False)

        out_copy(i, j, slot).start()

    if err_mode is not None:
        err_smem[0, 0] = total

    if len(order) >= 2:
        out_copy(*order[-2], _i32((len(order) - 2) % 2)).wait()
    out_copy(*order[-1], _i32((len(order) - 1) % 2)).wait()

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


def _rdma_jacobi3_shard_call(u, f, n: int, h: float, steps: int,
                             omega: float, ndev: int, interpret,
                             from_zero: bool = False,
                             axis_name: str = "z",
                             err_mode=None,
                             loopback: bool = False):
    """One RDMA-overlap fused pass on a LOCAL (nl, rp, cp) z-shard block
    (see _rdma_jacobi3_kernel); returns the smoothed owned block, plus the
    raw metric-scaled error partial when ``err_mode`` is set."""
    nl, rp, cp = u.shape
    itemsize = jnp.dtype(u.dtype).itemsize
    assert rdma_jacobi3_fits(nl, rp, cp, steps, itemsize,
                             err=err_mode == "clean")
    ext = steps + (1 if err_mode == "clean" else 0)
    zs, rs, oz, orow, num_zb, num_rb = _rdma_jacobi3_geometry(
        nl, rp, cp, ext, itemsize)

    kernel = partial(_rdma_jacobi3_kernel, n=n, nl=nl, rp=rp, cp=cp,
                     steps=steps, ext=ext, zs=zs, rs=rs, oz=oz, orow=orow,
                     num_zb=num_zb, num_rb=num_rb, h2=h * h, omega=omega,
                     from_zero=from_zero, ndev=ndev, axis_name=axis_name,
                     err_mode=err_mode, loopback=loopback)

    if interpret is True:
        interpret = pltpu.InterpretParams(detect_races=True)

    out_shape = jax.ShapeDtypeStruct((nl, rp, cp), u.dtype)
    out_spec = pl.BlockSpec(memory_space=pl.ANY)
    if err_mode is not None:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_spec = (out_spec, pl.BlockSpec(memory_space=pltpu.SMEM))

    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, ext, rp, cp), u.dtype),    # hu halo planes
            pltpu.VMEM((2, ext, rp, cp), u.dtype),    # hf halo planes
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # u slots
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # f slots -> C
            pltpu.VMEM((zs, rs, cp), u.dtype),        # ping-pong work
            pltpu.VMEM((zs, rs, cp), u.dtype),        # A coefficient brick
            pltpu.SemaphoreType.DMA((2, 2)),          # load sems
            pltpu.SemaphoreType.DMA((2,)),            # out sems
            pltpu.SemaphoreType.DMA((2,)),            # u send up/down
            pltpu.SemaphoreType.DMA((2,)),            # u recv up/down
            pltpu.SemaphoreType.DMA((2,)),            # f send up/down
            pltpu.SemaphoreType.DMA((2,)),            # f recv up/down
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
            collective_id=12 if ndev > 1 else None),
        interpret=interpret,
    )(u, f)
    if err_mode is not None:
        return result[0], result[1][0, 0]
    return result


# --- RDMA halo-overlap DESCEND leg (round 5) ----------------------------------
#
# The whole per-shard descend leg — k sweeps + residual + z/row full
# weighting + decimation + the fused clean-error partial — with the
# (k_nb+2)-plane u/f halo exchange IN-KERNEL: interior bricks run while
# the wires are busy (ops.pallas3d._fused_descend3_kernel's compute under
# the _rdma_jacobi3_kernel staging). The legs carry ~83% of the sharded
# 513³ cycle's modeled wire (BASELINE "Predicted 3-D z-plane scaling") —
# this is the overlap that closes the barrier-path loss.

RDMA3_DESCEND_BRICK_BUDGET = 56 * 1024 * 1024


def _rdma_descend3_geometry(nl: int, rp: int, cp: int, ext: int,
                            itemsize: int = 4):
    from .pallas3d import _brick_geometry
    import math

    nz_e = nl + 2 * ext
    # a larger brick budget than the smoother's: the descend leg carries
    # extra decimation scratch but must stay under the 32-brick static
    # unroll cap at the 513^3/8 shard (the 40 MiB budget lands at 33)
    zs, rs, oz, orow = _brick_geometry(nz_e, rp, cp, itemsize, z_halo=ext,
                                       num_bufs=6.6, orow_mult=16,
                                       oz_even=True,
                                       budget=RDMA3_DESCEND_BRICK_BUDGET)
    if zs < nz_e:
        oz = min(oz, nl - (nl % 2))
    else:
        oz = nl
    num_zb = math.ceil(nl / oz) if zs < nz_e else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1
    ozc = nl // 2 if zs >= nz_e else oz // 2
    return zs, rs, oz, orow, num_zb, num_rb, ozc


def rdma_descend3_fits(nl: int, rp: int, cp: int, steps: int,
                       from_zero: bool = True, itemsize: int = 4,
                       fw: bool = True) -> bool:
    k_nb = steps - 1 if from_zero else steps
    ext = k_nb + (2 if fw else 1)
    if not (1 <= steps and 1 <= k_nb and ext <= min(nl, 8)
            and nl % 2 == 0):
        return False
    plane = rp * cp * itemsize
    try:
        zs, rs, _, orow, num_zb, num_rb, ozc = _rdma_descend3_geometry(
            nl, rp, cp, ext, itemsize)
    except ValueError:
        return False
    total = (4 * ext * plane
             + (6 * zs * rs + rs + 2 * ozc * (orow // 2)) * cp * itemsize)
    return (num_zb * num_rb <= MAX_RDMA3_BRICKS
            and total + 16 * 1024 * 1024 <= 126 * 1024 * 1024)


def _rdma_descend3_kernel(u_hbm, f_hbm, out_hbm, dw_hbm, err_smem,
                          hu, hf, u_slots, fc_slots, work, a_buf,
                          dec_scr, dec_out,
                          load_sems, out_sems, dw_sems,
                          usend, urecv, fsend, frecv,
                          *, n: int, nl: int, rp: int, cp: int, steps: int,
                          ext: int, zs: int, rs: int, oz: int, orow: int,
                          num_zb: int, num_rb: int, ozc: int,
                          h2: float, omega: float, from_zero: bool,
                          fw: bool, ndev: int, axis_name: str,
                          loopback: bool = False):
    """See the section comment. Staging identical to _rdma_jacobi3_kernel
    (static interior-first brick schedule, halo splices from hu/hf);
    per-brick compute identical to ops.pallas3d._fused_descend3_kernel
    (sweeps + extra-Δ residual + FW + z/row decimation + own-masked err).
    Parity contract: nl EVEN (so my·nl is even and the local coarse-window
    arithmetic keeps global parity — the sharded fused leg's rule)."""
    from .pallas3d import _plane_sweep, _wrap_shift

    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    nz_e = nl + 2 * ext
    zoff = my * nl - ext
    zc_off = (my * nl) // 2            # global coarse of dw plane 0
    m = (n + 1) // 2
    orc = orow // 2
    dtype = u_hbm.dtype

    has_up, has_dn, up, dn = _ring_neighbors(my, ndev, loopback)

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
    fu = remote(f_hbm.at[pl.ds(0, ext)], hf.at[1], fsend.at[0],
                frecv.at[0], up)
    fd = remote(f_hbm.at[pl.ds(nl - ext, ext)], hf.at[0], fsend.at[1],
                frecv.at[1], dn)
    if not from_zero:
        # built only when started: an unstarted descriptor trips the
        # interpreter's unused-copy check on from_zero passes
        su = remote(u_hbm.at[pl.ds(0, ext)], hu.at[1], usend.at[0],
                    urecv.at[0], up)
        sd = remote(u_hbm.at[pl.ds(nl - ext, ext)], hu.at[0], usend.at[1],
                    urecv.at[1], dn)

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

    @pl.when(jnp.logical_not(has_up))
    def _():
        hf[0] = jnp.zeros((ext, rp, cp), dtype)
        if not from_zero:
            hu[0] = jnp.zeros((ext, rp, cp), dtype)

    @pl.when(jnp.logical_not(has_dn))
    def _():
        hf[1] = jnp.zeros((ext, rp, cp), dtype)
        if not from_zero:
            hu[1] = jnp.zeros((ext, rp, cp), dtype)

    zwin, rwin, order = _static_brick_schedule(
        nl, ext, zs, oz, orow, rp, rs, num_zb, num_rb, r_halo=8)

    def load_copies(i: int, j: int, slot):
        _, z0, top_ov, bot_ov = zwin(i)
        r0, _ = rwin(j)
        body = zs - top_ov - bot_ov
        copies = (pltpu.make_async_copy(
            f_hbm.at[pl.ds(z0 + top_ov - ext, body), pl.ds(r0, rs), :],
            fc_slots.at[slot, pl.ds(top_ov, body)],
            load_sems.at[slot, _i32(1)]),)
        if not from_zero:
            copies += (pltpu.make_async_copy(
                u_hbm.at[pl.ds(z0 + top_ov - ext, body), pl.ds(r0, rs), :],
                u_slots.at[slot, pl.ds(top_ov, body)],
                load_sems.at[slot, _i32(0)]),)
        return copies

    def out_copy(i: int, j: int, slot):
        wz, z0, _, _ = zwin(i)
        r0, wr = rwin(j)
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wz + ext - z0, oz),
                       pl.ds(wr - r0, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    def dw_copy(i: int, j: int, slot):
        wz, _, _, _ = zwin(i)
        _, wr = rwin(j)
        zc0 = (wz + 1) // 2
        cwr = ((wr // 2) // 8) * 8
        return pltpu.make_async_copy(
            dec_out.at[slot],
            dw_hbm.at[pl.ds(zc0, ozc), pl.ds(cwr, orc), :],
            dw_sems.at[slot])

    waited = {"top": False, "bot": False}

    def splice_halos(i: int, j: int, slot):
        _, z0, top_ov, bot_ov = zwin(i)
        r0, _ = rwin(j)
        if top_ov:
            if not waited["top"]:
                waited["top"] = True

                @pl.when(has_up)
                def _():
                    remote(f_hbm.at[pl.ds(nl - ext, ext)], hf.at[0],
                           fsend.at[1], frecv.at[1], dn).wait_recv()
                    if not from_zero:
                        remote(u_hbm.at[pl.ds(nl - ext, ext)], hu.at[0],
                               usend.at[1], urecv.at[1], dn).wait_recv()
            for t in range(top_ov):
                hfp = hf[0, z0 + t]
                fc_slots[slot, t] = hfp[r0:r0 + rs, :]
                if not from_zero:
                    hup = hu[0, z0 + t]
                    u_slots[slot, t] = hup[r0:r0 + rs, :]
        if bot_ov:
            if not waited["bot"]:
                waited["bot"] = True

                @pl.when(has_dn)
                def _():
                    remote(f_hbm.at[pl.ds(0, ext)], hf.at[1],
                           fsend.at[0], frecv.at[0], up).wait_recv()
                    if not from_zero:
                        remote(u_hbm.at[pl.ds(0, ext)], hu.at[1],
                               usend.at[0], urecv.at[0], up).wait_recv()
            for t in range(bot_ov):
                te = zs - bot_ov + t
                ze = z0 + te - (ext + nl)
                hfp = hf[1, ze]
                fc_slots[slot, te] = hfp[r0:r0 + rs, :]
                if not from_zero:
                    hup = hu[1, ze]
                    u_slots[slot, te] = hup[r0:r0 + rs, :]

    for cp_ in load_copies(*order[0], _i32(0)):
        cp_.start()

    w = jnp.asarray(omega / 6.0, dtype)
    h2c = jnp.asarray(h2, dtype)
    n_sweeps = steps - 1 if from_zero else steps
    total = jnp.zeros((), jnp.float32)

    for p, (i, j) in enumerate(order):
        slot = _i32(p % 2)
        nxt = _i32((p + 1) % 2)

        if p + 1 < len(order):
            if p >= 1:
                out_copy(*order[p - 1], nxt).wait()
                dw_copy(*order[p - 1], nxt).wait()
            for cp_ in load_copies(*order[p + 1], nxt):
                cp_.start()

        for cp_ in load_copies(i, j, slot):
            cp_.wait()
        splice_halos(i, j, slot)

        wz, z0, _, _ = zwin(i)
        r0, wr = rwin(j)

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows_i + r0
        ok = ((g >= 1) & (g <= n - 2) & (cols_i >= 1) & (cols_i <= n - 2)
              & (rows_i >= 1) & (rows_i <= rs - 2))
        a_plane = jnp.where(ok, w, jnp.zeros_like(w)).astype(dtype)

        def build_plane(t, c, z0=z0, g=g, cols_i=cols_i,
                        a_plane=a_plane, slot=slot):
            gz = zoff + _i32(z0) + t
            gate = (gz >= 1) & (gz <= n - 2) & (t > 0) & (t < zs - 1)
            ap = jnp.where(gate, a_plane, jnp.zeros_like(a_plane))
            a_buf[t] = ap
            raw_f = fc_slots[slot, t]
            fc_slots[slot, t] = ap * (h2c * raw_f)
            if from_zero:
                okg = ((g >= 1) & (g <= n - 2)
                       & (cols_i >= 1) & (cols_i <= n - 2)
                       & (gz >= 1) & (gz <= n - 2))
                u_slots[slot, t] = jnp.where(
                    okg, -(w * (h2c * raw_f)), jnp.zeros((rs, cp), dtype))
            return c

        jax.lax.fori_loop(_i32(0), _i32(zs), build_plane, _i32(0),
                          unroll=False)

        def read_u(t, slot=slot):
            return u_slots[slot, t]

        def write_u(t, v, slot=slot):
            u_slots[slot, t] = v

        def read_w(t):
            return work[t]

        def write_w(t, v):
            work[t] = v

        accessors = [(read_u, write_u), (read_w, write_w)]

        def sweep(rd, wr_, slot=slot):
            _plane_sweep(rd, wr_, lambda t: a_buf[t],
                         lambda t: fc_slots[slot, t], zs, rs, cp)

        for s in range(n_sweeps):
            sweep(accessors[s % 2][0], accessors[(s + 1) % 2][1])
        if n_sweeps % 2 == 1:
            def copy_back(t, c, slot=slot):
                u_slots[slot, t] = work[t]
                return c

            jax.lax.fori_loop(_i32(0), _i32(zs), copy_back, _i32(0),
                              unroll=False)
        out_copy(i, j, slot).start()

        # extra in-VMEM sweep: work := −r(fin) + own-masked err partial
        scale = jnp.asarray(-6.0 / (omega * h2), dtype)
        zero_plane = jnp.zeros((rs, cp), dtype)
        work[0] = zero_plane
        work[zs - 1] = zero_plane
        own_r = (g >= j * orow) & (g < min((j + 1) * orow, rp))
        olo, ohi = i * oz, min((i + 1) * oz, nl)

        def delta_plane(t, a2, z0=z0, slot=slot, own_r=own_r,
                        olo=olo, ohi=ohi):
            u = u_slots[slot, t]
            nb = (_nb_sum(u, rs, cp) + u_slots[slot, t - 1]
                  + u_slots[slot, t + 1] - 6.0 * u)
            d = a_buf[t] * nb - fc_slots[slot, t]
            work[t] = scale * d
            gz = zoff + _i32(z0) + t
            o = z0 + t - ext
            own = (own_r & (gz >= 1) & (gz <= n - 2)
                   & (o >= olo) & (o < ohi))
            av = jnp.abs(d).astype(jnp.float32)
            return a2 + jnp.sum(jnp.where(own, av, jnp.zeros_like(av)))

        part = jax.lax.fori_loop(_i32(1), _i32(zs - 1), delta_plane,
                                 jnp.zeros((), jnp.float32), unroll=False)
        total = total + part * abs(6.0 / (omega * h2))

        # full weighting + decimation into the coarse output brick
        zc0 = (wz + 1) // 2
        cwr = wr // 2
        wlo = wr - r0
        crow = jax.lax.broadcasted_iota(jnp.int32, (orc, cp), 0) + cwr
        ccol = jax.lax.broadcasted_iota(jnp.int32, (orc, cp), 1)
        keep_rc = ((crow >= 1) & (crow <= m - 2)
                   & (ccol >= 1) & (ccol <= n - 2))

        def cplane(tc, c, z0=z0, slot=slot, zc0=zc0, wlo=wlo,
                   keep_rc=keep_rc):
            zc = _i32(zc0) + tc
            lz = jnp.clip(2 * zc + _i32(ext) - _i32(z0), _i32(0),
                          _i32(zs - 1))
            if fw:
                lo = jnp.clip(lz - 1, _i32(0), _i32(zs - 1))
                hi = jnp.clip(lz + 1, _i32(0), _i32(zs - 1))
                pth = 0.25 * work[lo] + 0.5 * work[lz] + 0.25 * work[hi]
                pth = (0.25 * _wrap_shift(pth, 1, axis=0) + 0.5 * pth
                       + 0.25 * _wrap_shift(pth, rs - 1, axis=0))
                pth = (0.25 * _wrap_shift(pth, 1, axis=1) + 0.5 * pth
                       + 0.25 * _wrap_shift(pth, cp - 1, axis=1))
            else:
                pth = work[lz]
            dec_scr[:] = pth
            win = dec_scr[pl.ds(wlo, orow), :]
            dec = win.reshape(orc, 2, cp)[:, 0, :]
            gzc = zc_off + zc
            keep = keep_rc & (gzc >= 1) & (gzc <= m - 2)
            dec_out[slot, tc] = jnp.where(keep, dec, jnp.zeros_like(dec))
            return c

        jax.lax.fori_loop(_i32(0), _i32(ozc), cplane, _i32(0),
                          unroll=False)
        dw_copy(i, j, slot).start()

    err_smem[0, 0] = total

    if len(order) >= 2:
        out_copy(*order[-2], _i32((len(order) - 2) % 2)).wait()
        dw_copy(*order[-2], _i32((len(order) - 2) % 2)).wait()
    out_copy(*order[-1], _i32((len(order) - 1) % 2)).wait()
    dw_copy(*order[-1], _i32((len(order) - 1) % 2)).wait()

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


def _rdma_descend3_shard_call(u, f, n: int, h: float, steps: int,
                              omega: float, ndev: int, interpret,
                              from_zero: bool = False,
                              restriction: str = "full_weighting",
                              axis_name: str = "z",
                              loopback: bool = False):
    """The whole RDMA-overlap descend leg on a LOCAL (nl, rp, cp) z-shard;
    returns (u_out, dw_local (nl//2, rp//2, cp), raw err partial)."""
    nl, rp, cp = u.shape
    itemsize = jnp.dtype(u.dtype).itemsize
    fw = restriction == "full_weighting"
    if not fw and restriction != "sampling":
        raise ValueError(f"unknown restriction mode {restriction!r}")
    assert rdma_descend3_fits(nl, rp, cp, steps, from_zero, itemsize, fw)
    k_nb = steps - 1 if from_zero else steps
    ext = k_nb + (2 if fw else 1)
    zs, rs, oz, orow, num_zb, num_rb, ozc = _rdma_descend3_geometry(
        nl, rp, cp, ext, itemsize)

    kernel = partial(_rdma_descend3_kernel, n=n, nl=nl, rp=rp, cp=cp,
                     steps=steps, ext=ext, zs=zs, rs=rs, oz=oz, orow=orow,
                     num_zb=num_zb, num_rb=num_rb, ozc=ozc, h2=h * h,
                     omega=omega, from_zero=from_zero, fw=fw, ndev=ndev,
                     axis_name=axis_name, loopback=loopback)

    if interpret is True:
        interpret = pltpu.InterpretParams(detect_races=True)

    out, dw, stat = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nl, rp, cp), u.dtype),
                   jax.ShapeDtypeStruct((nl // 2, rp // 2, cp), u.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, ext, rp, cp), u.dtype),    # hu
            pltpu.VMEM((2, ext, rp, cp), u.dtype),    # hf
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # u slots
            pltpu.VMEM((2, zs, rs, cp), u.dtype),     # f slots -> C
            pltpu.VMEM((zs, rs, cp), u.dtype),        # ping-pong / rneg
            pltpu.VMEM((zs, rs, cp), u.dtype),        # A coefficient brick
            pltpu.VMEM((rs, cp), u.dtype),            # FW plane scratch
            pltpu.VMEM((2, ozc, orow // 2, cp), u.dtype),   # dec slots
            pltpu.SemaphoreType.DMA((2, 2)),          # load sems
            pltpu.SemaphoreType.DMA((2,)),            # out sems
            pltpu.SemaphoreType.DMA((2,)),            # dw sems
            pltpu.SemaphoreType.DMA((2,)),            # u send
            pltpu.SemaphoreType.DMA((2,)),            # u recv
            pltpu.SemaphoreType.DMA((2,)),            # f send
            pltpu.SemaphoreType.DMA((2,)),            # f recv
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
            collective_id=13 if ndev > 1 else None),
        interpret=interpret,
    )(u, f)
    return out, dw, stat[0, 0]


# --- RDMA halo-overlap ASCEND leg (round 5) -----------------------------------

def _rdma_ascend3_geometry(nl: int, rp: int, cp: int, ext_z: int,
                           itemsize: int = 4):
    from .pallas3d import _brick_geometry
    import math

    nz_e = nl + 2 * ext_z
    zs, rs, oz, orow = _brick_geometry(nz_e, rp, cp, itemsize,
                                       z_halo=ext_z, num_bufs=6.6,
                                       orow_mult=16, r_halo=16,
                                       zs_even=True,
                                       budget=RDMA3_DESCEND_BRICK_BUDGET)
    oz = nl if zs >= nz_e else min(oz, nl)
    num_zb = math.ceil(nl / oz) if zs < nz_e else 1
    num_rb = math.ceil(rp / orow) if rs < rp else 1
    czs = (nz_e // 2 + 1) if zs >= nz_e else zs // 2 + 1
    crs = min(rs // 2 + 8, rp // 2 + 8)
    return zs, rs, oz, orow, num_zb, num_rb, czs, crs


def rdma_ascend3_fits(nl: int, rp: int, cp: int, steps: int,
                      err: bool = False, itemsize: int = 4) -> bool:
    z_halo = steps + (1 if err else 0)
    ext_z = z_halo + (z_halo % 2)
    ext_c = ext_z // 2
    if not (1 <= steps <= 8 and ext_z <= min(nl, 8) and nl % 2 == 0
            and ext_c + 1 <= nl // 2):
        return False
    plane = rp * cp * itemsize
    cplane = (rp // 2 + 8) * cp * itemsize
    try:
        zs, rs, _, _, num_zb, num_rb, czs, crs = _rdma_ascend3_geometry(
            nl, rp, cp, ext_z, itemsize)
    except ValueError:
        return False
    total = (4 * ext_z * plane + (2 * ext_c + 1) * cplane
             + (6 * zs * rs + 2 * czs * crs) * cp * itemsize)
    return (num_zb * num_rb <= MAX_RDMA3_BRICKS
            and total + 16 * 1024 * 1024 <= 126 * 1024 * 1024)


def _rdma_ascend3_kernel(u_hbm, f_hbm, cw_hbm, *rest,
                         n: int, nl: int, rp: int, cp: int, steps: int,
                         ext_z: int, zs: int, rs: int, oz: int, orow: int,
                         czs: int, crs: int, num_zb: int, num_rb: int,
                         h2: float, omega: float, err_mode=None,
                         ndev: int = 1, axis_name: str = "z",
                         loopback: bool = False):
    """The WHOLE per-shard ascend leg (trilinear prolongation + add + k
    post-sweeps, optional fused clean err) with IN-KERNEL remote-DMA
    halos: u/f exchange ext_z planes each side and the lane-expanded
    coarse correction exchanges ext_c (up) / ext_c+1 (down) planes —
    interior bricks run while the wires are busy. Staging mirrors
    _rdma_jacobi3_kernel; per-brick compute mirrors
    ops.pallas3d._fused_ascend3_kernel. Parity: nl EVEN and my·nl even
    (the sharded leg's contract), cw local depth EXACTLY nl // 2."""
    from .pallas3d import _plane_sweep

    if err_mode is None:
        out_hbm, = rest[:1]
        rest = rest[1:]
    else:
        out_hbm, err_smem = rest[:2]
        rest = rest[2:]
    (hu, hf, hcw, u_slots, fc_slots, cw_slots, work, a_buf,
     load_sems, out_sems, usend, urecv, fsend, frecv, csend, crecv) = rest

    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    nz_e = nl + 2 * ext_z
    ext_c = ext_z // 2
    nlc = nl // 2
    crp = rp // 2 + 8
    zoff = my * nl - ext_z
    dtype = u_hbm.dtype

    has_up, has_dn, up, dn = _ring_neighbors(my, ndev, loopback)

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
    fu = remote(f_hbm.at[pl.ds(0, ext_z)], hf.at[1], fsend.at[0],
                frecv.at[0], up)
    fd = remote(f_hbm.at[pl.ds(nl - ext_z, ext_z)], hf.at[0], fsend.at[1],
                frecv.at[1], dn)
    su = remote(u_hbm.at[pl.ds(0, ext_z)], hu.at[1], usend.at[0],
                urecv.at[0], up)
    sd = remote(u_hbm.at[pl.ds(nl - ext_z, ext_z)], hu.at[0], usend.at[1],
                urecv.at[1], dn)
    # coarse: my FIRST ext_c+1 planes are the up neighbor's BOTTOM ext
    # (its hcw[1]); my LAST ext_c planes are the down neighbor's TOP ext.
    # hcw is (2, ext_c + 1, crp, cp); the top side uses planes [0, ext_c)
    cu_s = remote(cw_hbm.at[pl.ds(0, ext_c + 1)], hcw.at[1], csend.at[0],
                  crecv.at[0], up)
    cd_s = remote(cw_hbm.at[pl.ds(nlc - ext_c, ext_c)],
                  hcw.at[0, pl.ds(0, ext_c)], csend.at[1], crecv.at[1], dn)

    @pl.when(has_up)
    def _():
        fu.start()
        su.start()
        cu_s.start()

    @pl.when(has_dn)
    def _():
        fd.start()
        sd.start()
        cd_s.start()

    @pl.when(jnp.logical_not(has_up))
    def _():
        hf[0] = jnp.zeros((ext_z, rp, cp), dtype)
        hu[0] = jnp.zeros((ext_z, rp, cp), dtype)
        hcw[0] = jnp.zeros((ext_c + 1, crp, cp), dtype)

    @pl.when(jnp.logical_not(has_dn))
    def _():
        hf[1] = jnp.zeros((ext_z, rp, cp), dtype)
        hu[1] = jnp.zeros((ext_z, rp, cp), dtype)
        hcw[1] = jnp.zeros((ext_c + 1, crp, cp), dtype)

    def cwin_of(zwin_fn):
        def cwin(i: int):
            _, z0, _, _ = zwin_fn(i)
            cz0 = z0 // 2
            top_cov = max(0, ext_c - cz0)
            bot_cov = max(0, cz0 + czs - (ext_c + nlc))
            return cz0, top_cov, bot_cov
        return cwin

    _zwin_tmp, rwin, _ = _static_brick_schedule(
        nl, ext_z, zs, oz, orow, rp, rs, num_zb, num_rb, r_halo=16)
    cwin = cwin_of(_zwin_tmp)
    zwin, rwin, order = _static_brick_schedule(
        nl, ext_z, zs, oz, orow, rp, rs, num_zb, num_rb, r_halo=16,
        extra_interior=lambda i: (cwin(i)[1] == 0 and cwin(i)[2] == 0))

    def load_copies(i: int, j: int, slot):
        _, z0, top_ov, bot_ov = zwin(i)
        cz0, top_cov, bot_cov = cwin(i)
        r0, _ = rwin(j)
        cr0 = ((r0 // 2) // 8) * 8
        cr0 = min(cr0, crp - crs)
        body = zs - top_ov - bot_ov
        cbody = czs - top_cov - bot_cov
        return (pltpu.make_async_copy(
                    u_hbm.at[pl.ds(z0 + top_ov - ext_z, body),
                             pl.ds(r0, rs), :],
                    u_slots.at[slot, pl.ds(top_ov, body)],
                    load_sems.at[slot, _i32(0)]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(z0 + top_ov - ext_z, body),
                             pl.ds(r0, rs), :],
                    fc_slots.at[slot, pl.ds(top_ov, body)],
                    load_sems.at[slot, _i32(1)]),
                pltpu.make_async_copy(
                    cw_hbm.at[pl.ds(cz0 + top_cov - ext_c, cbody),
                              pl.ds(cr0, crs), :],
                    cw_slots.at[slot, pl.ds(top_cov, cbody)],
                    load_sems.at[slot, _i32(2)]))

    def out_copy(i: int, j: int, slot):
        wz, z0, _, _ = zwin(i)
        r0, wr = rwin(j)
        return pltpu.make_async_copy(
            u_slots.at[slot, pl.ds(wz + ext_z - z0, oz),
                       pl.ds(wr - r0, orow), :],
            out_hbm.at[pl.ds(wz, oz), pl.ds(wr, orow), :],
            out_sems.at[slot])

    waited = {"top": False, "bot": False}

    def splice_halos(i: int, j: int, slot):
        _, z0, top_ov, bot_ov = zwin(i)
        cz0, top_cov, bot_cov = cwin(i)
        r0, _ = rwin(j)
        cr0 = min(((r0 // 2) // 8) * 8, crp - crs)
        if top_ov or top_cov:
            if not waited["top"]:
                waited["top"] = True

                @pl.when(has_up)
                def _():
                    remote(f_hbm.at[pl.ds(nl - ext_z, ext_z)], hf.at[0],
                           fsend.at[1], frecv.at[1], dn).wait_recv()
                    remote(u_hbm.at[pl.ds(nl - ext_z, ext_z)], hu.at[0],
                           usend.at[1], urecv.at[1], dn).wait_recv()
                    remote(cw_hbm.at[pl.ds(nlc - ext_c, ext_c)],
                           hcw.at[0, pl.ds(0, ext_c)], csend.at[1],
                           crecv.at[1], dn).wait_recv()
            for t in range(top_ov):
                hfp = hf[0, z0 + t]
                fc_slots[slot, t] = hfp[r0:r0 + rs, :]
                hup = hu[0, z0 + t]
                u_slots[slot, t] = hup[r0:r0 + rs, :]
            for t in range(top_cov):
                hcp = hcw[0, cz0 + t]
                cw_slots[slot, t] = hcp[cr0:cr0 + crs, :]
        if bot_ov or bot_cov:
            if not waited["bot"]:
                waited["bot"] = True

                @pl.when(has_dn)
                def _():
                    remote(f_hbm.at[pl.ds(0, ext_z)], hf.at[1],
                           fsend.at[0], frecv.at[0], up).wait_recv()
                    remote(u_hbm.at[pl.ds(0, ext_z)], hu.at[1],
                           usend.at[0], urecv.at[0], up).wait_recv()
                    remote(cw_hbm.at[pl.ds(0, ext_c + 1)], hcw.at[1],
                           csend.at[0], crecv.at[0], up).wait_recv()
            for t in range(bot_ov):
                te = zs - bot_ov + t
                ze = z0 + te - (ext_z + nl)
                hfp = hf[1, ze]
                fc_slots[slot, te] = hfp[r0:r0 + rs, :]
                hup = hu[1, ze]
                u_slots[slot, te] = hup[r0:r0 + rs, :]
            for t in range(bot_cov):
                te = czs - bot_cov + t
                ce = cz0 + te - (ext_c + nlc)
                hcp = hcw[1, ce]
                cw_slots[slot, te] = hcp[cr0:cr0 + crs, :]

    for cp_ in load_copies(*order[0], _i32(0)):
        cp_.start()

    w = jnp.asarray(omega / 6.0, dtype)
    half = jnp.asarray(0.5, dtype)
    h2c = jnp.asarray(h2, dtype)
    total = jnp.zeros((), jnp.float32)

    for p, (i, j) in enumerate(order):
        slot = _i32(p % 2)
        nxt = _i32((p + 1) % 2)

        if p + 1 < len(order):
            if p >= 1:
                out_copy(*order[p - 1], nxt).wait()
            for cp_ in load_copies(*order[p + 1], nxt):
                cp_.start()

        for cp_ in load_copies(i, j, slot):
            cp_.wait()
        splice_halos(i, j, slot)

        _, z0, _, _ = zwin(i)
        cz0, _, _ = cwin(i)
        r0, wr = rwin(j)

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (rs, cp), 1)
        g = rows_i + r0
        ok_rc = ((g >= 1) & (g <= n - 2) & (cols_i >= 1)
                 & (cols_i <= n - 2))
        ok = ok_rc & (rows_i >= 1) & (rows_i <= rs - 2)
        a_plane = jnp.where(ok, w, jnp.zeros_like(w)).astype(dtype)
        hr = rs // 2

        def build_plane(t, c, z0=z0, cz0=cz0, slot=slot, g=g,
                        ok_rc=ok_rc, a_plane=a_plane):
            gz = _i32(z0) + t         # ext-local: drives the cw indexing
            gzg = zoff + gz           # global: drives the Dirichlet gates
            gate = (gzg >= 1) & (gzg <= n - 2) & (t > 0) & (t < zs - 1)
            ap = jnp.where(gate, a_plane, jnp.zeros_like(a_plane))
            a_buf[t] = ap
            fc_slots[slot, t] = ap * (h2c * fc_slots[slot, t])

            lo = gz // _i32(2) - _i32(cz0)
            hi = (gz + _i32(1)) // _i32(2) - _i32(cz0)
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

        def read_u(t, slot=slot):
            return u_slots[slot, t]

        def write_u(t, v, slot=slot):
            u_slots[slot, t] = v

        def read_w(t):
            return work[t]

        def write_w(t, v):
            work[t] = v

        accessors = [(read_u, write_u), (read_w, write_w)]

        def sweep(rd, wr_, slot=slot):
            _plane_sweep(rd, wr_, lambda t: a_buf[t],
                         lambda t: fc_slots[slot, t], zs, rs, cp)

        for s in range(steps):
            sweep(accessors[s % 2][0], accessors[(s + 1) % 2][1])

        if err_mode is not None:      # "clean": fused Σ|r(u_final)| partial
            rd_fin = accessors[steps % 2][0]
            own_r = (g >= j * orow) & (g < min((j + 1) * orow, rp))
            olo, ohi = i * oz, min((i + 1) * oz, nl)

            def err_plane(t, a2, z0=z0, slot=slot, rd_fin=rd_fin,
                          own_r=own_r, olo=olo, ohi=ohi, g=g,
                          cols_i=cols_i):
                gzg = zoff + _i32(z0) + t
                o = z0 + t - ext_z
                own = (own_r & (g >= 1) & (g <= n - 2)
                       & (cols_i >= 1) & (cols_i <= n - 2)
                       & (gzg >= 1) & (gzg <= n - 2)
                       & (o >= olo) & (o < ohi))
                u = rd_fin(t)
                nb = (_nb_sum(u, rs, cp) + rd_fin(t - 1) + rd_fin(t + 1)
                      - 6.0 * u)
                val = jnp.abs(a_buf[t] * nb
                              - fc_slots[slot, t]).astype(jnp.float32)
                return a2 + jnp.sum(jnp.where(own, val,
                                              jnp.zeros_like(val)))

            part = jax.lax.fori_loop(_i32(1), _i32(zs - 1), err_plane,
                                     jnp.zeros((), jnp.float32),
                                     unroll=False)
            total = total + part * abs(6.0 / (omega * h2))

        if steps % 2 == 1:
            def copy_back(t, c, slot=slot):
                u_slots[slot, t] = work[t]
                return c

            jax.lax.fori_loop(_i32(0), _i32(zs), copy_back, _i32(0),
                              unroll=False)

        out_copy(i, j, slot).start()

    if err_mode is not None:
        err_smem[0, 0] = total

    if len(order) >= 2:
        out_copy(*order[-2], _i32((len(order) - 2) % 2)).wait()
    out_copy(*order[-1], _i32((len(order) - 1) % 2)).wait()

    @pl.when(has_up)
    def _():
        fu.wait_send()
        su.wait_send()
        cu_s.wait_send()

    @pl.when(has_dn)
    def _():
        fd.wait_send()
        sd.wait_send()
        cd_s.wait_send()


def _rdma_ascend3_shard_call(u, f, cwide, n: int, h: float, steps: int,
                             omega: float, ndev: int, interpret,
                             err_mode=None, axis_name: str = "z",
                             loopback: bool = False):
    """The whole RDMA-overlap ascend leg on a LOCAL (nl, rp, cp) z-shard
    with its (nl//2, rp//2+8, cp) lane-expanded coarse block; returns the
    post-smoothed owned block (+ raw err partial under err_mode)."""
    nl, rp, cp = u.shape
    itemsize = jnp.dtype(u.dtype).itemsize
    assert cwide.shape == (nl // 2, rp // 2 + 8, cp), cwide.shape
    assert rdma_ascend3_fits(nl, rp, cp, steps, err_mode is not None,
                             itemsize)
    z_halo = steps + (1 if err_mode is not None else 0)
    ext_z = z_halo + (z_halo % 2)
    ext_c = ext_z // 2
    zs, rs, oz, orow, num_zb, num_rb, czs, crs = _rdma_ascend3_geometry(
        nl, rp, cp, ext_z, itemsize)
    crp = rp // 2 + 8

    kernel = partial(_rdma_ascend3_kernel, n=n, nl=nl, rp=rp, cp=cp,
                     steps=steps, ext_z=ext_z, zs=zs, rs=rs, oz=oz,
                     orow=orow, czs=czs, crs=crs, num_zb=num_zb,
                     num_rb=num_rb, h2=h * h, omega=omega,
                     err_mode=err_mode, ndev=ndev, axis_name=axis_name,
                     loopback=loopback)

    if interpret is True:
        interpret = pltpu.InterpretParams(detect_races=True)

    out_shape = jax.ShapeDtypeStruct((nl, rp, cp), u.dtype)
    out_spec = pl.BlockSpec(memory_space=pl.ANY)
    if err_mode is not None:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_spec = (out_spec, pl.BlockSpec(memory_space=pltpu.SMEM))

    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, ext_z, rp, cp), u.dtype),        # hu
            pltpu.VMEM((2, ext_z, rp, cp), u.dtype),        # hf
            pltpu.VMEM((2, ext_c + 1, crp, cp), u.dtype),   # hcw
            pltpu.VMEM((2, zs, rs, cp), u.dtype),           # u slots
            pltpu.VMEM((2, zs, rs, cp), u.dtype),           # f slots -> C
            pltpu.VMEM((2, czs, crs, cp), u.dtype),         # coarse slots
            pltpu.VMEM((zs, rs, cp), u.dtype),              # ping-pong
            pltpu.VMEM((zs, rs, cp), u.dtype),              # A brick
            pltpu.SemaphoreType.DMA((2, 3)),                # load sems
            pltpu.SemaphoreType.DMA((2,)),                  # out sems
            pltpu.SemaphoreType.DMA((2,)),                  # u send
            pltpu.SemaphoreType.DMA((2,)),                  # u recv
            pltpu.SemaphoreType.DMA((2,)),                  # f send
            pltpu.SemaphoreType.DMA((2,)),                  # f recv
            pltpu.SemaphoreType.DMA((2,)),                  # cw send
            pltpu.SemaphoreType.DMA((2,)),                  # cw recv
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
            collective_id=14 if ndev > 1 else None),
        interpret=interpret,
    )(u, f, cwide)
    if err_mode is not None:
        return result[0], result[1][0, 0]
    return result

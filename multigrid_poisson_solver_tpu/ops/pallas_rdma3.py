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

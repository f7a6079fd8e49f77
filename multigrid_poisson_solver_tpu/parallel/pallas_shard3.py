"""shard_map + per-shard Pallas for the 3-D hot path: fused brick kernels
under a 1-D z-plane decomposition.

The 3-D GSPMD path (tests/test_parallel3.py, __graft_entry__) partitions the
plain-jnp V-cycle; like the round-1 2-D story, that abandons the fused brick
kernels (ops.pallas3d) under sharding. This module is the 3-D member of the
parallel.pallas_shard family:

  * the volume stays a global (nzp, rp, cp) padded array elsewhere; each
    smoothing/residual call drops into ``shard_map`` (manual mode) over a
    1-D mesh on the z axis — contiguous plane blocks per device, the
    natural 3-D analog of the 2-D rows policy;
  * per fused pass (≤8 sweeps), every device ``lax.ppermute``s its ``k``
    edge PLANES to its ring neighbors — one halo exchange per pass instead
    of k per-sweep GSPMD collectives, riding ICI;
  * each shard runs the SAME brick-streamed kernel as the single-device
    path on its halo-extended block, with the block's global z origin in
    SMEM so the z-Dirichlet gates stay exact under partitioning;
  * the z-halo of exactly ``k`` planes is the same trapezoid argument that
    makes interior brick z-cuts exact for k fused sweeps, so owned planes
    BIT-MATCH the unsharded kernel.

Alignment contract: the z axis is untiled in Mosaic (plane offsets need no
alignment), so the only requirement is equal blocks — ``nzp`` must divide
the device count. ``padded_depth3`` / ``pad_planes3`` provide compliant
volumes (zero planes at gz ≥ n are frozen by the global gates and stay
zero). Rows/lanes are never split by this policy: every shard keeps full
(rp, cp) planes, Mosaic tiling untouched.

No reference counterpart (single GPU, strictly 2-D)."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas3d import (
    MAX_DESCEND3_SWEEPS_FW,
    MAX_DESCEND3_SWEEPS_SAMPLING,
    MAX_FUSED_SWEEPS_3D,
    _fused_ascend3_shard_call,
    _fused_descend3_shard_call,
    _fused_jacobi3_shard_call,
    _residual3_shard_call,
    padded_shape3,
)

Z_AXIS = "z"


def make_mesh_z(devices=None, axis_name: str = Z_AXIS) -> Mesh:
    """A 1-D mesh over the z (plane) axis."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def z_sharding(mesh: Mesh, axis_name: str = Z_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name, None, None))


def padded_depth3(n: int, n_devices: int) -> int:
    """Plane count after padding to a device-divisible depth."""
    return -(-n // n_devices) * n_devices


def sharded_shape3(n: int, n_devices: int) -> tuple[int, int, int]:
    nz, rp, cp = padded_shape3(n)
    return (padded_depth3(n, n_devices), rp, cp)


def pad_planes3(a: jnp.ndarray, n_devices: int) -> jnp.ndarray:
    """Zero-pad trailing z planes so the depth divides the device count
    (shard_map needs equal blocks; the padded planes sit at gz > n − 1 and
    are frozen by every kernel's global Dirichlet gates)."""
    nz = a.shape[0]
    nzp = padded_depth3(nz, n_devices)
    if nzp == nz:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((nzp - nz,) + a.shape[1:], a.dtype)], axis=0)


@dataclasses.dataclass(frozen=True)
class ZShardingPolicy3:
    """Per-level z-plane sharding decisions for the 3-D compiled engine —
    the cubic-hierarchy analog of ``parallel.mesh.ShardingPolicy``.

    Levels with at least ``threshold_planes`` planes per device (and big
    enough for the brick kernels, n ≥ 65) are partitioned into contiguous
    z-plane blocks; coarser levels are replicated (the standard multigrid
    coarse-level agglomeration). Sharded levels pad their depth to a
    multiple of 2·n_devices so every shard owns an EVEN plane count — the
    parity contract that lets the fused descend/ascend legs run per shard
    (see sharded_fused_descend3). Padding planes sit at gz ≥ n and are
    frozen zero by every kernel's global Dirichlet gates.

    Reference analog: none (single GPU, 2-D); this is SURVEY §2's
    "parallelism strategies" layer applied to the 3-D engine."""

    mesh: Mesh
    axis_name: str = Z_AXIS
    threshold_planes: int = 8

    @property
    def n_devices(self) -> int:
        import numpy as np
        return int(np.prod(list(self.mesh.shape.values())))

    def is_sharded(self, n: int) -> bool:
        ndev = self.n_devices
        return (ndev > 1 and n >= 65
                and self.padded_depth(n) // ndev >= self.threshold_planes)

    def padded_depth(self, n: int) -> int:
        """Stored plane count for level n: ×(2·n_devices) when the level
        would shard, exactly n otherwise (the plain padded_shape3 depth)."""
        ndev = self.n_devices
        if ndev > 1 and n >= 65:
            zp = padded_depth3(n, 2 * ndev)
            if zp // ndev >= self.threshold_planes:
                return zp
        return n

    def spec(self, n: int) -> P:
        return (P(self.axis_name, None, None) if self.is_sharded(n)
                else P())

    def sharding(self, n: int) -> NamedSharding:
        return NamedSharding(self.mesh, self.spec(n))

    def padded_shape3(self, n: int) -> tuple[int, int, int]:
        _, rp, cp = padded_shape3(n)
        return (self.padded_depth(n), rp, cp)


def _ring_perms(ndev: int):
    fwd = [(i, (i + 1) % ndev) for i in range(ndev)]   # receive from previous
    bwd = [(i, (i - 1) % ndev) for i in range(ndev)]   # receive from next
    return fwd, bwd


def _extend_planes(x, axis: str, k: int):
    """Prepend/append the k edge planes of the ring neighbors (wrap-around
    values land only on globally-gated planes and never propagate past the
    frozen Dirichlet faces)."""
    fwd, bwd = _ring_perms(lax.axis_size(axis))
    above = lax.ppermute(x[-k:], axis, fwd)
    below = lax.ppermute(x[:k], axis, bwd)
    return jnp.concatenate([above, x, below], axis=0)


def _check_shape(u, n: int, mesh: Mesh, axis_name: str):
    ndev = mesh.shape[axis_name]
    _, rp, cp = padded_shape3(n)
    assert (u.shape[1:] == (rp, cp) and u.shape[0] % ndev == 0
            and u.shape[0] >= n), (
        f"global volume {u.shape} is not a z-sharded padded layout for "
        f"n={n} on {ndev} devices (rows/lanes {rp}x{cp}, depth a multiple "
        f"of {ndev} and >= {n}; extra planes are frozen zero padding); "
        f"build arrays with pad_planes3(pad_grid3(a), ndev)")


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "mesh",
                                   "axis_name", "from_zero", "interpret"))
def sharded_fused_jacobi3(u, f, n: int, h: float, steps: int,
                          omega: float, mesh: Mesh,
                          axis_name: str = Z_AXIS,
                          from_zero: bool = False,
                          interpret: bool = False):
    """``steps`` fused 3-D damped-Jacobi sweeps on a z-sharded volume.

    Semantics identical to ops.pallas3d.fused_jacobi3_padded on the global
    volume: owned planes bit-match the unsharded kernel. One plane-halo
    exchange per ≤8-sweep pass."""
    _check_shape(u, n, mesh, axis_name)

    def body(u_loc, f_loc):
        nz_loc = u_loc.shape[0]
        zi = lax.axis_index(axis_name)

        # the one-neighbor ppermute supplies at most nz_loc halo planes, so
        # a pass fuses at most that many sweeps (only binds for extremely
        # shallow shards)
        kmax = min(MAX_FUSED_SWEEPS_3D, nz_loc)
        ext = min(steps, kmax)
        zoff = (zi * nz_loc - ext).astype(jnp.int32).reshape(1)
        # f never changes between passes: ONE halo exchange for the whole
        # smooth; a from_zero first pass skips the u exchange entirely (the
        # kernel never reads the u stream — zeros stand in as the formal
        # operand)
        f_e = _extend_planes(f_loc, axis_name, ext)
        out, remaining, first = u_loc, steps, True
        while remaining > 0:
            k = min(remaining, kmax)
            if from_zero and first:
                u_e = jnp.zeros_like(f_e)
            else:
                u_e = _extend_planes(out, axis_name, ext)
            out = _fused_jacobi3_shard_call(
                zoff, u_e, f_e, n, h, k, omega, ext_z=ext,
                from_zero=from_zero and first, interpret=interpret)
            remaining -= k
            first = False
        return out

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=spec, check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "compat",
                                   "mesh", "axis_name", "from_zero",
                                   "interpret"))
def sharded_fused_jacobi3_err(u, f, n: int, h: float, steps: int,
                              omega: float, compat, mesh: Mesh,
                              axis_name: str = Z_AXIS,
                              from_zero: bool = False,
                              interpret: bool = False):
    """``steps`` z-sharded fused sweeps WITH the smoothing-error metric
    fused into the final pass — the 3-D twin of
    parallel.pallas_shard.sharded_fused_jacobi_err. Returns (u, raw) with
    ``raw`` the metric-scaled error partial psum-reduced over the z axis
    (the kernel's ownership mask restricts each shard's partial to owned
    interior planes, so the psum is exact); divide by n³ for the mean.

    ``compat`` ∈ {"clean", "gpu"} (the 3-D engine's two metrics). The
    clean metric's extra in-VMEM residual sweep burns one halo ring, so
    the final pass carries ≤7 effective sweeps."""
    _check_shape(u, n, mesh, axis_name)
    err_mode = "gpu" if compat == "gpu" else "clean"
    assert steps >= 1

    def body(u_loc, f_loc):
        nz_loc = u_loc.shape[0]
        zi = lax.axis_index(axis_name)
        kmax = min(MAX_FUSED_SWEEPS_3D, nz_loc)
        # the final pass carries the error reduction; clean's extra
        # in-VMEM residual sweep needs k_eff ≤ 7 AND one more halo plane
        # (z_halo = k_eff + 1 ≤ nz_loc: one-neighbor ppermute bound)
        if err_mode == "gpu":
            last_cap = kmax
        else:
            assert nz_loc >= 2, "clean metric needs ≥2 planes per device"
            last_cap = min(7, nz_loc - 1)
        last = min(steps, last_cap)
        out, remaining, first = u_loc, steps - last, True
        while remaining > 0:
            k = min(remaining, kmax)
            zoff = (zi * nz_loc - k).astype(jnp.int32).reshape(1)
            f_e = _extend_planes(f_loc, axis_name, k)
            if from_zero and first:
                u_e = jnp.zeros_like(f_e)
            else:
                u_e = _extend_planes(out, axis_name, k)
            out = _fused_jacobi3_shard_call(
                zoff, u_e, f_e, n, h, k, omega, ext_z=k,
                from_zero=from_zero and first, interpret=interpret)
            remaining -= k
            first = False
        fz = from_zero and first
        k_eff = last - (1 if fz else 0)
        z_halo = last if err_mode == "gpu" else k_eff + 1
        ext = min(max(z_halo, 1), nz_loc)
        assert z_halo <= ext, (steps, last, nz_loc)
        zoff = (zi * nz_loc - ext).astype(jnp.int32).reshape(1)
        f_e = _extend_planes(f_loc, axis_name, ext)
        if fz:
            u_e = jnp.zeros_like(f_e)
        else:
            u_e = _extend_planes(out, axis_name, ext)
        out, raw = _fused_jacobi3_shard_call(
            zoff, u_e, f_e, n, h, last, omega, ext_z=ext, from_zero=fz,
            interpret=interpret, err_mode=err_mode)
        return out, lax.psum(raw, axis_name)

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=(spec, P()), check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "compat",
                                   "mesh", "axis_name", "interpret"))
def sharded_fused_jacobi3_errs(u, f, n: int, h: float, steps: int,
                               omega: float, compat, mesh: Mesh,
                               axis_name: str = Z_AXIS,
                               interpret: bool = False):
    """Sharded twin of ops.pallas3d.fused_jacobi3_errs_padded: ONE fused
    per-shard pass emitting the metric of EVERY iterate u_1..u_steps
    (trigger batching), partials psum-reduced over the z axis — the 3-D
    member of parallel.pallas_shard.sharded_fused_jacobi_errs. The clean
    metric's extra in-VMEM residual sweep needs a steps+1 halo ring, so
    shards must carry at least that many planes."""
    from ..ops.pallas3d import errs3_sweep_cap

    _check_shape(u, n, mesh, axis_name)
    err_mode = "gpu" if compat == "gpu" else "clean"
    assert 1 <= steps <= errs3_sweep_cap(compat)
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev
    ext = steps if err_mode == "gpu" else steps + 1
    assert ext <= nl, (
        f"batched sharded trigger needs {ext} halo planes <= {nl} "
        f"planes/device (shrink the batch or the ring)")

    def body(u_loc, f_loc):
        nz_loc = u_loc.shape[0]
        zi = lax.axis_index(axis_name)
        zoff = (zi * nz_loc - ext).astype(jnp.int32).reshape(1)
        u_e = _extend_planes(u_loc, axis_name, ext)
        f_e = _extend_planes(f_loc, axis_name, ext)
        out, raws = _fused_jacobi3_shard_call(
            zoff, u_e, f_e, n, h, steps, omega, ext_z=ext,
            from_zero=False, interpret=interpret, err_mode=err_mode,
            per_sweep=True)
        return out, lax.psum(raws, axis_name)

    spec = P(axis_name, None, None)
    u_new, raws = shard_map(body, mesh=mesh, in_specs=(spec, spec),
                            out_specs=(spec, P()), check_vma=False)(u, f)
    return u_new, (raws / jnp.float32(n) ** 3).astype(u.dtype)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "mesh",
                                   "axis_name", "from_zero", "negate",
                                   "interpret"))
def sharded_smooth_residual3(u, f, n: int, h: float, steps: int,
                             omega: float, mesh: Mesh,
                             axis_name: str = Z_AXIS,
                             from_zero: bool = False, negate: bool = False,
                             interpret: bool = False):
    """``steps`` fused sweeps AND the final iterate's residual volume in ONE
    per-shard kernel pass (ops.pallas3d emit_residual) — the z-sharded
    descend's smoother+residual without the separate pass's u/f re-read.
    Falls back to the two-kernel pair when the fused form's ≤7-sweep ring
    or the shard depth can't host the halo."""
    _check_shape(u, n, mesh, axis_name)
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev
    k_eff = steps - 1 if from_zero else steps
    if not (1 <= steps and k_eff <= 7 and k_eff + 1 <= nl):
        out = sharded_fused_jacobi3(u, f, n, h, steps, omega, mesh,
                                    axis_name, from_zero=from_zero,
                                    interpret=interpret)
        return out, sharded_residual3_pallas(out, f, n, h, mesh, axis_name,
                                             negate=negate,
                                             interpret=interpret)

    ext = k_eff + 1          # the residual's extra in-VMEM sweep ring

    def body(u_loc, f_loc):
        nz_loc = u_loc.shape[0]
        zi = lax.axis_index(axis_name)
        zoff = (zi * nz_loc - ext).astype(jnp.int32).reshape(1)
        f_e = _extend_planes(f_loc, axis_name, ext)
        if from_zero:
            u_e = jnp.zeros_like(f_e)
        else:
            u_e = _extend_planes(u_loc, axis_name, ext)
        return _fused_jacobi3_shard_call(
            zoff, u_e, f_e, n, h, steps, omega, ext_z=ext,
            from_zero=from_zero, interpret=interpret,
            emit_residual=True, negate=negate)

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=(spec, spec), check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "mesh", "axis_name", "negate",
                                   "interpret"))
def sharded_residual3_pallas(u, f, n: int, h: float, mesh: Mesh,
                             axis_name: str = Z_AXIS, negate: bool = False,
                             interpret: bool = False):
    """Brick-streamed 7-point residual on a z-sharded volume; matches
    ops.pallas3d.residual3_pallas on owned planes."""
    _check_shape(u, n, mesh, axis_name)

    def body(u_loc, f_loc):
        nz_loc = u_loc.shape[0]
        zi = lax.axis_index(axis_name)
        zoff = (zi * nz_loc - 1).astype(jnp.int32).reshape(1)
        u_e = _extend_planes(u_loc, axis_name, 1)
        f_e = _extend_planes(f_loc, axis_name, 1)
        return _residual3_shard_call(zoff, u_e, f_e, n, h, negate,
                                     ext_z=1, interpret=interpret)

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=spec, check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "mesh",
                                   "axis_name", "from_zero", "restriction",
                                   "interpret"))
def sharded_fused_descend3(u, f, n: int, h: float, steps: int, omega: float,
                           mesh: Mesh, axis_name: str = Z_AXIS,
                           from_zero: bool = False,
                           restriction: str = "full_weighting",
                           interpret: bool = False):
    """The WHOLE descend leg per shard: sweeps + residual + z/row
    restriction (+ err partial) in one kernel pass per z-shard.

    Requires an EVEN plane count per device (then every shard's global
    start is even and the kernel's local coarse-window arithmetic is
    parity-preserved — see the kernel docstring). Returns
    (u_new z-sharded, dwide z-sharded at HALF depth, err psum-replicated);
    finish with ops.padded3.restrict3_lanes_p (mz ≥ m aware)."""
    _check_shape(u, n, mesh, axis_name)
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev
    fw = restriction == "full_weighting"
    k_nb = steps - 1 if from_zero else steps
    z_halo = k_nb + (2 if fw else 1)
    cap = MAX_DESCEND3_SWEEPS_FW if fw else MAX_DESCEND3_SWEEPS_SAMPLING
    assert nl % 2 == 0, (
        f"sharded descend needs an even plane count per device, got {nl}; "
        f"pad the volume to a multiple of 2x{ndev} planes")
    assert 1 <= steps and 0 <= k_nb <= cap and z_halo <= nl, (steps, nl)

    def body(u_loc, f_loc):
        zi = lax.axis_index(axis_name)
        zoff = (zi * nl - z_halo).astype(jnp.int32).reshape(1)
        f_e = _extend_planes(f_loc, axis_name, z_halo)
        if from_zero:
            u_e = jnp.zeros_like(f_e)
        else:
            u_e = _extend_planes(u_loc, axis_name, z_halo)
        u_new, dw, err = _fused_descend3_shard_call(
            zoff, u_e, f_e, n, h, steps, omega, ext_z=z_halo,
            from_zero=from_zero, restriction=restriction,
            interpret=interpret)
        return u_new, dw, lax.psum(err[0, 0], axis_name)

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=(spec, spec, P()), check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "mesh",
                                   "axis_name", "err_mode", "interpret"))
def sharded_fused_ascend3(u, f, cwide, n: int, h: float, steps: int,
                          omega: float, mesh: Mesh,
                          axis_name: str = Z_AXIS, err_mode=None,
                          interpret: bool = False):
    """The WHOLE ascend leg per shard: trilinear prolongation + correction
    add + post-sweeps in one kernel pass per z-shard.

    ``cwide`` is the lane-expanded coarse correction
    (ops.padded3.prolong3_lanes_p), z-sharded with EXACTLY half the fine
    depth (so shard-local coarse planes line up with shard-local fine
    planes — the nl-even parity contract again). One fine + one coarse
    plane-halo exchange per call.

    ``err_mode="clean"`` also returns the raw Σ|r(u_final)| partial
    psum-reduced over the z axis (the kernel's ownership mask makes the
    psum exact; divide by n³ for the mean) — its extra in-VMEM residual
    sweep consumes one halo ring, so steps ≤ 7."""
    _check_shape(u, n, mesh, axis_name)
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev
    assert nl % 2 == 0, (
        f"sharded ascend needs an even plane count per device, got {nl}")
    assert cwide.shape[0] * 2 == u.shape[0], (cwide.shape, u.shape)
    assert 1 <= steps <= MAX_FUSED_SWEEPS_3D
    z_halo = steps if err_mode is None else steps + 1
    assert err_mode in (None, "clean") and z_halo <= MAX_FUSED_SWEEPS_3D
    ext_z = z_halo + (z_halo % 2)        # even halo >= z_halo
    ext_c = ext_z // 2
    assert ext_z <= nl and ext_c + 1 <= nl // 2, (steps, nl)

    def body(u_loc, f_loc, cw_loc):
        zi = lax.axis_index(axis_name)
        zoff = (zi * nl - ext_z).astype(jnp.int32).reshape(1)
        u_e = _extend_planes(u_loc, axis_name, ext_z)
        f_e = _extend_planes(f_loc, axis_name, ext_z)
        # ext-local coarse: plane c ↔ global coarse (zoff + 2c)//2, i.e.
        # ext_c planes from the previous shard, ext_c + 1 from the next
        fwd, bwd = _ring_perms(lax.axis_size(axis_name))
        above = lax.ppermute(cw_loc[-ext_c:], axis_name, fwd)
        below = lax.ppermute(cw_loc[:ext_c + 1], axis_name, bwd)
        cw_e = jnp.concatenate([above, cw_loc, below], axis=0)
        out = _fused_ascend3_shard_call(
            zoff, u_e, f_e, cw_e, n, h, steps, omega, ext_z=ext_z,
            interpret=interpret, err_mode=err_mode)
        if err_mode is not None:
            u_new, raw = out
            return u_new, lax.psum(raw, axis_name)
        return out

    spec = P(axis_name, None, None)
    if err_mode is not None:
        return shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=(spec, P()), check_vma=False)(u, f, cwide)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(u, f, cwide)


@partial(jax.jit, static_argnames=("n", "h", "trigger", "omega", "compat",
                                   "max_sweeps", "mesh", "axis_name",
                                   "interpret"))
def rdma_fused_trigger3(u, f, n: int, h: float, trigger: float,
                        omega: float, compat, max_sweeps: int, mesh: Mesh,
                        axis_name: str = Z_AXIS, interpret: bool = False):
    """The WHOLE 3-D error-trigger loop across the z-plane ring in ONE
    kernel per chip (ops.pallas_rdma3._rdma_trigger3_kernel): each shard's
    plane block + folded source stay VMEM-resident for the entire loop;
    per sweep, ONE fresh edge plane moves to each ring neighbor by remote
    DMA (READY-handshaked) and the scalar metric by an in-kernel
    per-sender-semaphore all-to-all that doubles as the inter-sweep
    barrier — zero kernel launches and zero XLA collectives per sweep (the
    per-pass sharded path above pays a dispatch + plane ppermutes + a psum
    each sweep). Returns (u, err), err normalized by n³ like
    pallas3d.fused_trigger3_vmem. Select with ``SolverConfig(halo="rdma")``
    under a ZShardingPolicy3; admission by ops.pallas_rdma3
    .rdma_trigger3_fits. Validation mirrors the 2-D whole-loop kernel:
    bit-match + race detection vs the per-pass sharded loop on the
    interpreter mesh (tests/test_rdma.py); real multi-chip wall-clock
    needs real rings."""
    _check_shape(u, n, mesh, axis_name)
    ndev = mesh.shape[axis_name]

    from ..ops.pallas_rdma3 import _rdma_trigger3_shard_call

    def body(u_loc, f_loc):
        return _rdma_trigger3_shard_call(
            u_loc, f_loc, n, h, trigger, omega, compat, max_sweeps,
            ndev=ndev, interpret=interpret, axis_name=axis_name)

    spec = P(axis_name, None, None)
    u_new, err = shard_map(body, mesh=mesh, in_specs=(spec, spec),
                           out_specs=(spec, P()), check_vma=False)(u, f)
    return u_new, err


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "mesh",
                                   "axis_name", "from_zero", "interpret"))
def rdma_fused_jacobi3(u, f, n: int, h: float, steps: int, omega: float,
                       mesh: Mesh, axis_name: str = Z_AXIS,
                       from_zero: bool = False, interpret: bool = False):
    """``steps`` fused 3-D sweeps with IN-KERNEL remote-DMA plane halos
    (ops.pallas_rdma3._rdma_jacobi3_kernel): interior (z,row) bricks
    smooth while the ext-plane halo DMAs ride the wires — replacing the
    per-pass ``lax.ppermute`` barrier of :func:`sharded_fused_jacobi3`
    with compute/communication overlap. Iterates bit-match the ppermute
    path (identical per-point expression trees at the same pass
    chunking). Passes are split ≤8 sweeps like the barrier path; select
    with ``SolverConfig(halo="rdma")``. Validation mirrors the RDMA
    trigger: bit-match + race detection on the interpreter mesh
    (tests/test_rdma.py), loopback execution on hardware."""
    from ..ops.pallas_rdma3 import (
        _rdma_jacobi3_shard_call,
        rdma_jacobi3_fits,
    )

    _check_shape(u, n, mesh, axis_name)
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev

    def body(u_loc, f_loc):
        # chunk exactly like the ppermute path (min(8, planes/device) per
        # pass) so iterates stay bit-comparable; shrink a chunk only when
        # its halo/brick working set cannot be admitted
        kmax = min(MAX_FUSED_SWEEPS_3D, nl)
        isz = jnp.dtype(u_loc.dtype).itemsize
        out, remaining, first = u_loc, steps, True
        while remaining > 0:
            k = min(remaining, kmax)
            while k > 1 and not rdma_jacobi3_fits(nl, *u_loc.shape[1:], k,
                                                  isz):
                k -= 1
            out = _rdma_jacobi3_shard_call(
                out, f_loc, n, h, k, omega, ndev=ndev,
                interpret=interpret, from_zero=from_zero and first,
                axis_name=axis_name)
            remaining -= k
            first = False
        return out

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=spec, check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "mesh",
                                   "axis_name", "from_zero", "restriction",
                                   "interpret"))
def rdma_fused_descend3(u, f, n: int, h: float, steps: int, omega: float,
                        mesh: Mesh, axis_name: str = Z_AXIS,
                        from_zero: bool = False,
                        restriction: str = "full_weighting",
                        interpret: bool = False):
    """The WHOLE per-shard descend leg with IN-KERNEL remote-DMA plane
    halos (ops.pallas_rdma3._rdma_descend3_kernel): the RDMA twin of
    :func:`sharded_fused_descend3` — interior bricks run k sweeps +
    residual + restriction while the (k_nb+2)-plane u/f halo exchange
    rides the wires. Same parity contract (EVEN planes/device), same
    outputs (u z-sharded, dwide at half depth, err psum-replicated);
    iterates/dw bit-match the ppermute leg."""
    from ..ops.pallas_rdma3 import _rdma_descend3_shard_call

    _check_shape(u, n, mesh, axis_name)
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev
    assert nl % 2 == 0, (
        f"sharded descend needs an even plane count per device, got {nl}")

    def body(u_loc, f_loc):
        out, dw, raw = _rdma_descend3_shard_call(
            u_loc, f_loc, n, h, steps, omega, ndev=ndev,
            interpret=interpret, from_zero=from_zero,
            restriction=restriction, axis_name=axis_name)
        return out, dw, lax.psum(raw, axis_name)

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=(spec, spec, P()), check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "mesh",
                                   "axis_name", "err_mode", "interpret"))
def rdma_fused_ascend3(u, f, cwide, n: int, h: float, steps: int,
                       omega: float, mesh: Mesh,
                       axis_name: str = Z_AXIS, err_mode=None,
                       interpret: bool = False):
    """The WHOLE per-shard ascend leg with IN-KERNEL remote-DMA halos —
    the RDMA twin of :func:`sharded_fused_ascend3`: u/f exchange ext_z
    planes and the half-depth lane-expanded coarse correction its
    ext_c/ext_c+1 planes, all overlapped with interior brick compute.
    Same contract (EVEN planes/device, cwide at EXACTLY half the fine
    depth); iterates bit-match the ppermute leg."""
    from ..ops.pallas_rdma3 import _rdma_ascend3_shard_call

    _check_shape(u, n, mesh, axis_name)
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev
    assert nl % 2 == 0 and cwide.shape[0] * 2 == u.shape[0]

    def body(u_loc, f_loc, cw_loc):
        out = _rdma_ascend3_shard_call(
            u_loc, f_loc, cw_loc, n, h, steps, omega, ndev=ndev,
            interpret=interpret, err_mode=err_mode, axis_name=axis_name)
        if err_mode is not None:
            u_new, raw = out
            return u_new, lax.psum(raw, axis_name)
        return out

    spec = P(axis_name, None, None)
    if err_mode is not None:
        return shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=(spec, P()), check_vma=False)(u, f,
                                                                 cwide)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(u, f, cwide)


@partial(jax.jit, static_argnames=("n", "h", "steps", "omega", "compat",
                                   "mesh", "axis_name", "interpret"))
def rdma_fused_jacobi3_err(u, f, n: int, h: float, steps: int,
                           omega: float, compat, mesh: Mesh,
                           axis_name: str = Z_AXIS,
                           interpret: bool = False):
    """:func:`rdma_fused_jacobi3` WITH the smoothing-error metric fused
    into the final pass — the RDMA twin of
    :func:`sharded_fused_jacobi3_err` (same pass chunking, so iterates
    stay bit-comparable; the raw metric-scaled partial is psum-reduced
    over the ring, divide by n³ for the mean)."""
    from ..ops.pallas_rdma3 import (
        _rdma_jacobi3_shard_call,
        rdma_jacobi3_fits,
    )

    _check_shape(u, n, mesh, axis_name)
    err_mode = "gpu" if compat == "gpu" else "clean"
    ndev = mesh.shape[axis_name]
    nl = u.shape[0] // ndev
    assert steps >= 1

    def body(u_loc, f_loc):
        nz_loc = u_loc.shape[0]
        shape2 = u_loc.shape[1:]
        kmax = min(MAX_FUSED_SWEEPS_3D, nz_loc)
        if err_mode == "gpu":
            last_cap = kmax
        else:
            last_cap = min(7, nz_loc - 1)
        isz = jnp.dtype(u_loc.dtype).itemsize
        last = min(steps, last_cap)
        while last > 1 and not rdma_jacobi3_fits(
                nl, *shape2, last, isz, err=err_mode == "clean"):
            last -= 1
        out, remaining = u_loc, steps - last
        while remaining > 0:
            k = min(remaining, kmax)
            while k > 1 and not rdma_jacobi3_fits(nl, *shape2, k, isz):
                k -= 1
            out = _rdma_jacobi3_shard_call(
                out, f_loc, n, h, k, omega, ndev=ndev,
                interpret=interpret, axis_name=axis_name)
            remaining -= k
        out, raw = _rdma_jacobi3_shard_call(
            out, f_loc, n, h, last, omega, ndev=ndev, interpret=interpret,
            axis_name=axis_name, err_mode=err_mode)
        return out, lax.psum(raw, axis_name)

    spec = P(axis_name, None, None)
    return shard_map(body, mesh=mesh, in_specs=(spec, spec),
                     out_specs=(spec, P()), check_vma=False)(u, f)


@partial(jax.jit, static_argnames=("n", "h", "mesh", "axis_name", "n_min",
                                   "pre", "post", "coarse_sweeps", "omega",
                                   "threshold_planes", "halo", "interpret"))
def v_cycle3_sharded(u, f, n: int, h: float, mesh: Mesh,
                     axis_name: str = Z_AXIS, n_min: int = 5, pre: int = 3,
                     post: int = 3, coarse_sweeps: int = 50,
                     omega: float = 6.0 / 7.0, threshold_planes: int = 8,
                     halo: str = "ppermute", interpret: bool = False):
    """One recursive 3-D V-cycle, multi-chip: per-shard fused brick kernels
    on every level deep enough to shard, replicated below (coarse-level
    agglomeration).

    The full z-sharded analog of models.poisson3d.v_cycle3(kernels="pallas"):

      * levels with ≥ ``threshold_planes`` planes/device run smoothing and
        the residual through shard_map + the brick kernels (one plane-halo
        ppermute per fused pass) — multi-chip keeps the single-chip kernel
        win instead of falling back to GSPMD roll stencils;
      * the 2:1 transfers stay the padded-layout einsum resamplings
        (ops.padded3) on z-padded depths under GSPMD sharding constraints
        (einsum is what the SPMD partitioner handles well — the round-1
        lesson was that per-sweep STENCILS are what it does badly);
      * below the threshold the hierarchy is replicated and the remaining
        sub-cycle is the single-device padded-resident v_cycle3_p.

    ``u``/``f`` are cubic (n, n, n) global arrays; returns the cycled u.
    ``halo="rdma"`` routes the fused legs and the post-smoothing through
    the in-kernel remote-DMA kernels where admissible (bit-matching the
    ppermute paths); the odd-planes fallback descend stays on ppermute.
    """
    from ..models.poisson3d import _sizes, v_cycle3_p
    from ..ops import padded3 as pd3
    from ..ops.pallas3d import pad_grid3, unpad_grid3

    ndev = mesh.shape[axis_name]
    sizes = _sizes(n, n_min)
    zsh = z_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, jax.sharding.PartitionSpec())
    wsc = jax.lax.with_sharding_constraint

    def is_sharded(s: int) -> bool:
        return (ndev > 1 and s >= 65
                and padded_depth3(s, ndev) // ndev >= threshold_planes)

    def run(up, fp, nn, hh, depth, from_zero):
        if not is_sharded(nn):
            # replicated remainder: the whole sub-cycle from this level down.
            # An unsharded TOP level arrives z-padded to the device-divisible
            # depth — drop the pad planes (zero, frozen) to the exact
            # padded_shape3 depth v_cycle3_p expects; re-padding on return.
            zp = up.shape[0]
            up, fp = wsc(up, rep), wsc(fp, rep)
            out = v_cycle3_p(up[:nn], fp[:nn], nn, hh, n_min=n_min, pre=pre,
                             post=post, coarse_sweeps=coarse_sweeps,
                             omega=omega)
            if zp > nn:
                out = jnp.concatenate(
                    [out, jnp.zeros((zp - nn,) + out.shape[1:], out.dtype)],
                    axis=0)
            return out
        up, fp = wsc(up, zsh), wsc(fp, zsh)
        if depth == len(sizes) - 1:     # sharded coarsest (huge n_min only)
            return sharded_fused_jacobi3(up, fp, nn, hh, coarse_sweeps,
                                         omega, mesh, axis_name,
                                         from_zero=from_zero,
                                         interpret=interpret)
        m = sizes[depth + 1]
        child_sharded = is_sharded(m)
        nl = up.shape[0] // ndev
        k_nb = pre - (1 if from_zero else 0)
        # FULL per-shard descend leg when the shard depth allows it (even
        # planes/device + the k_nb+2 halo ring): one kernel + one halo
        # exchange replaces smoother+residual passes AND the z/row transfer
        # einsums; only the quarter-volume lane take stays XLA
        if (nl % 2 == 0 and 1 <= k_nb <= MAX_DESCEND3_SWEEPS_FW
                and k_nb + 2 <= nl):
            down_fn = sharded_fused_descend3
            if halo == "rdma":
                from ..ops.pallas_rdma3 import rdma_descend3_fits
                if rdma_descend3_fits(nl, *up.shape[1:], pre, from_zero,
                                      jnp.dtype(up.dtype).itemsize, True):
                    down_fn = rdma_fused_descend3
            up, dw, _ = down_fn(
                up, fp, nn, hh, pre, omega, mesh, axis_name,
                from_zero=from_zero, restriction="full_weighting",
                interpret=interpret)
            fc = wsc(pd3.restrict3_lanes_p(dw, nn, m),
                     zsh if child_sharded else rep)
        else:
            up, rneg = sharded_smooth_residual3(
                up, fp, nn, hh, pre, omega, mesh, axis_name,
                from_zero=from_zero, negate=True, interpret=interpret)
            zp_out = padded_depth3(m, ndev) if child_sharded else m
            fc = wsc(pd3.restrict3_p(rneg, nn, m, zp_out=zp_out),
                     zsh if child_sharded else rep)
        ec = run(jnp.zeros_like(fc), fc, m, 2 * hh, depth + 1, True)
        # FULL per-shard ascend leg when depths line up (even planes/device
        # and a half-depth coarse level): lane-expand stays a local einsum,
        # everything else — z-combine, row interleave, add, post-sweeps —
        # is one kernel + two plane-halo exchanges
        if (nl % 2 == 0 and 1 <= post <= MAX_FUSED_SWEEPS_3D
                and 2 * ec.shape[0] == up.shape[0]
                and post + (post % 2) <= nl
                and (post + (post % 2)) // 2 + 1 <= nl // 2):
            cw = wsc(pd3.prolong3_lanes_p(ec, nn, m), zsh)
            up_fn = sharded_fused_ascend3
            if halo == "rdma":
                from ..ops.pallas_rdma3 import rdma_ascend3_fits
                if rdma_ascend3_fits(nl, *up.shape[1:], post, False,
                                     jnp.dtype(up.dtype).itemsize):
                    up_fn = rdma_fused_ascend3
            return up_fn(up, fp, cw, nn, hh, post, omega,
                         mesh, axis_name, interpret=interpret)
        up = wsc(pd3.prolong3_add_p(up, ec, nn, m), zsh)
        sm_fn = sharded_fused_jacobi3
        if halo == "rdma":
            from ..ops.pallas_rdma3 import rdma_jacobi3_fits
            if rdma_jacobi3_fits(nl, *up.shape[1:],
                                 min(post, MAX_FUSED_SWEEPS_3D, nl),
                                 jnp.dtype(up.dtype).itemsize):
                sm_fn = rdma_fused_jacobi3
        return sm_fn(up, fp, nn, hh, post, omega, mesh,
                     axis_name, interpret=interpret)

    # pad the top depth to a multiple of 2·ndev: EVEN planes/device, the
    # per-shard descend leg's parity requirement (child levels inherit
    # half the depth, staying ×ndev; odd-depth children fall back to the
    # smooth_residual + einsum-transfer path per level)
    up = wsc(pad_planes3(pad_grid3(u), 2 * ndev), zsh)
    fp = wsc(pad_planes3(pad_grid3(f), 2 * ndev), zsh)
    return unpad_grid3(run(up, fp, n, h, 0, False), n)


__all__ = ["make_mesh_z", "z_sharding", "padded_depth3", "sharded_shape3",
           "pad_planes3", "ZShardingPolicy3", "sharded_fused_jacobi3",
           "sharded_fused_jacobi3_err", "sharded_fused_jacobi3_errs",
           "sharded_fused_ascend3", "sharded_fused_descend3",
           "sharded_residual3_pallas", "sharded_smooth_residual3",
           "rdma_fused_trigger3", "rdma_fused_jacobi3",
           "rdma_fused_descend3", "rdma_fused_ascend3",
           "rdma_fused_jacobi3_err", "v_cycle3_sharded", "Z_AXIS"]

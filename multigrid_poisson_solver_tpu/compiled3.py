"""Whole-schedule compiled 3-D engine: one XLA program per CycleProgram.

The 3-D analog of compiled.py: the entire instruction walk — every smoothing
sweep, residual+restriction, coarse solve, and prolongation+add on every
level — is traced into ONE jitted function. Level shapes are static, trigger
loops and the red-black GS coarse solve are device-side ``lax.while_loop``s,
so a chained multi-cycle schedule runs with zero host round-trips.

Node semantics match solver3.Solver3D exactly (same ops); the consistency
test (tests/test_compiled3.py) pins the two engines together, mirroring the
2-D interpreted-vs-compiled contract.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .grid import GridSpec
from .models import poisson3d as p3
from .models.poisson3d import Problem3D
from .schedule import Ascend, CoarseSolve, CycleProgram, Descend
from .solver import SolverConfig, effective_trigger_cap
from .solver3 import _prolong_add3, _restrict_residual3


def _use_pallas3(config: SolverConfig) -> bool:
    mode = getattr(config, "kernels", "auto")
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return mode == "pallas"


_PALLAS3_MIN_N = 65  # below this the brick kernels don't pay for themselves


def _trace_program3(u, f, *, program: CycleProgram, problem: Problem3D,
                    config: SolverConfig, policy=None, warm: bool):
    """The traced instruction walk. ``u``/``f`` are the finest-level arrays;
    returns (u_final, last_smoothing_error).

    Under ``config.kernels`` = "pallas" (or "auto" on TPU) every level's
    state lives in the padded (nz, rp, cp) brick layout for the whole
    program: smoothing (with the clean OR gpu error metric fused into the
    final kernel pass), trigger loops (one fused sweep+metric pass per
    sweep; batched under cfg.trigger_batch), and residual+restriction run
    the fused brick kernels (ops.pallas3d), and the 2:1 transfers the
    padded operators (ops.padded3), on levels with n ≥ 65; small levels,
    non-jacobi smoothers, non-2:1 transfers and coarse solves hop through
    the plain-jnp ops (cheap at those sizes). This mirrors the 2-D compiled
    engine's kernel routing (compiled.py) one dimension up.

    ``policy`` (parallel.pallas_shard3.ZShardingPolicy3) makes the SAME
    instruction walk multi-chip: levels the policy shards keep their state
    z-plane-partitioned (depth padded to ×2·n_devices — even planes per
    device, the fused legs' parity contract) and run the per-shard brick
    kernels (sharded smoothing/error/trigger, sharded fused descend/ascend
    legs, one plane-halo ppermute per pass); coarser levels replicate (the
    agglomeration strategy). Without the pallas path the policy degrades to
    GSPMD sharding constraints on the plain-jnp ops."""
    cfg = config
    compat = "gpu" if cfg.compat_error == "gpu" else "clean"
    use_pallas = _use_pallas3(cfg)
    spec0 = GridSpec(program.n_max, program.length, program.min_x,
                     program.min_y)
    if use_pallas:
        from .ops import padded3 as pd3
        from .ops import pallas3d as p3k
        interp = jax.default_backend() != "tpu"
    if policy is not None:
        from .parallel import pallas_shard3 as ps3

    def sharded(n: int) -> bool:
        return (policy is not None and use_pallas
                and cfg.smoother == "jacobi" and policy.is_sharded(n))

    def cz(a, n):
        """Constrain a level-n array to its policy sharding (identity
        single-chip). Replicated-under-policy levels pin P()."""
        if policy is None:
            return a
        return jax.lax.with_sharding_constraint(
            a, policy.sharding(n) if sharded(n)
            else jax.sharding.NamedSharding(
                policy.mesh, jax.sharding.PartitionSpec()))

    def zp_of(n: int) -> int:
        """Stored plane count of level n (policy depth when sharded)."""
        return policy.padded_depth(n) if sharded(n) else n

    def conform_z(a, zp: int):
        """Slice/zero-pad the z depth to ``zp`` (all crossed planes are
        frozen zero padding at gz ≥ n)."""
        if a.shape[0] == zp:
            return a
        if a.shape[0] > zp:
            return a[:zp]
        return jnp.concatenate(
            [a, jnp.zeros((zp - a.shape[0],) + a.shape[1:], a.dtype)], 0)

    # padded-layout helpers (identity when the pallas path is off: state is
    # then kept unpadded and these are never called)
    def to_p(a, n):
        return cz(conform_z(p3k.pad_grid3(a), zp_of(n)), n)

    def from_p(a, n):
        return p3k.unpad_grid3(a, n)

    def smooth_xla(u, f, h, steps):
        if steps == -1:
            # n from the ARRAY, not from h: round(1/h)+1 is wrong whenever
            # program.length != 1 and would mis-size the watchdog cap
            u, err, _ = p3.trigger_smooth3(
                u, f, h, cfg.trigger, cfg.omega, compat, cfg.smoother,
                effective_trigger_cap(cfg.max_trigger_sweeps,
                                      u.shape[0], dim=3))
            return u, err
        return p3.smooth3(u, f, h, steps=steps, omega=cfg.omega,
                          compat=compat, smoother=cfg.smoother)

    def smooth(lu, lf, n, h, steps):
        """State-layout-polymorphic smoothing: padded under pallas. The
        error metric (clean OR gpu) is fused into the final kernel pass —
        no separate residual sweep over HBM (the 2-D compiled engine's
        ker_Smoothing_GPU-style fusion, one dimension up). Sharded levels
        run the per-shard kernels with the error psum-reduced over the
        mesh (parallel.pallas_shard3.sharded_fused_jacobi3_err)."""
        if not use_pallas:
            if policy is not None:
                lu = cz(lu, n)
                lf = cz(lf, n)
            return smooth_xla(lu, lf, h, steps)
        if sharded(n):
            if steps == -1:
                return trigger_p(lu, lf, n, h)
            if cfg.halo == "rdma" and cfg.smoother == "jacobi":
                from .ops.pallas_rdma3 import rdma_jacobi3_fits
                nl = policy.padded_depth(n) // policy.n_devices
                _, rp_, cp_ = p3k.padded_shape3(n)
                k1 = min(steps, p3k.MAX_FUSED_SWEEPS_3D, nl)
                if rdma_jacobi3_fits(nl, rp_, cp_, min(k1, 7),
                                     jnp.dtype(cfg.dtype).itemsize,
                                     err=compat != "gpu"):
                    # in-kernel remote-DMA plane halos: interior bricks
                    # smooth while the wires are busy (replaces the
                    # ppermute barrier; iterates bit-match it)
                    u2, raw = ps3.rdma_fused_jacobi3_err(
                        lu, lf, n, h, steps, cfg.omega, compat,
                        policy.mesh, policy.axis_name, interpret=interp)
                    return cz(u2, n), (raw / (n ** 3)).astype(cfg.dtype)
            u2, raw = ps3.sharded_fused_jacobi3_err(
                lu, lf, n, h, steps, cfg.omega, compat, policy.mesh,
                policy.axis_name, interpret=interp)
            return cz(u2, n), (raw / (n ** 3)).astype(cfg.dtype)
        fast = n >= _PALLAS3_MIN_N and cfg.smoother == "jacobi"
        if steps == -1 and fast:
            return trigger_p(lu, lf, n, h)
        fast = fast and steps >= 1
        if not fast:
            u, err = smooth_xla(from_p(lu, n), from_p(lf, n), h, steps)
            return to_p(u, n), err
        k, err = steps, None
        while k > 0:
            kk = min(k, p3k.MAX_FUSED_SWEEPS_3D)
            emode = compat if k == kk else None       # metric of the FINAL pass
            if emode == "clean" and kk > 7:
                emode = None                          # err ring needs ≤7 sweeps
            if emode is not None:
                lu, raw = p3k.fused_jacobi3_padded(
                    lu, lf, n, h, kk, omega=cfg.omega, interpret=interp,
                    err_mode=emode)
                err = (raw / (n ** 3)).astype(cfg.dtype)
            else:
                lu = p3k.fused_jacobi3_padded(lu, lf, n, h, kk,
                                              omega=cfg.omega,
                                              interpret=interp)
            k -= kk
        if err is None:   # clean metric after a full 8-sweep final pass
            r = p3k.residual3_pallas(lu, lf, n, h, interpret=interp)
            err = (jnp.sum(jnp.abs(r)) / (n ** 3)).astype(cfg.dtype)
        return lu, err

    def trigger_p(lu, lf, n, h):
        """Error-triggered smoothing on the padded fast path: ONE fused
        kernel pass (sweep + metric partial) per trigger sweep — vs the XLA
        fallback's separate sweep and residual passes. Same slope-stop rule
        as models.poisson3d.trigger_smooth3.

        With cfg.trigger_batch > 1, ``batch`` sweeps run per HBM pass with
        per-iterate error partials (pallas3d.fused_jacobi3_errs_padded) and
        the slope rule replays against the batch's error vector — the
        iterate overshoots the exact stop point by up to batch − 1 sweeps
        (extra smoothing, never less; flag-gated, as in the 2-D engine)."""
        mode = compat              # already normalized to "clean" | "gpu"
        # hoisted once like the 2-D engine: the cap (and its binding-cap
        # warning) must not be re-evaluated inside every traced cond
        max_sweeps = effective_trigger_cap(cfg.max_trigger_sweeps, n, dim=3)

        if sharded(n):
            if cfg.halo == "rdma":
                from .ops.pallas_rdma3 import rdma_trigger3_fits
                nl = policy.padded_depth(n) // policy.n_devices
                _, rp, cp = p3k.padded_shape3(n)
                if rdma_trigger3_fits(nl, rp, cp,
                                      jnp.dtype(cfg.dtype).itemsize):
                    # the WHOLE trigger loop in ONE kernel per chip:
                    # per-shard plane block + folded source VMEM-resident,
                    # remote-DMA plane halos + in-kernel scalar all-reduce
                    # per sweep — zero dispatch and zero XLA collectives
                    # per sweep (parallel.pallas_shard3.rdma_fused_trigger3)
                    u_out, err = ps3.rdma_fused_trigger3(
                        lu, lf, n, h, cfg.trigger, cfg.omega, compat,
                        max_sweeps,
                        policy.mesh, policy.axis_name, interpret=interp)
                    # match the per-pass sharded path's level-error dtype
                    # under non-f32 configs (halo modes must agree)
                    return cz(u_out, n), err.astype(cfg.dtype)

            # per-pass sharded loop: ONE fused per-shard kernel pass (sweep
            # + psum'd metric partial) per trigger sweep — the in-VMEM /
            # streamed tiers below are single-chip-resident by design
            def one_sharded(v):
                v2, raw = ps3.sharded_fused_jacobi3_err(
                    v, lf, n, h, 1, cfg.omega, compat, policy.mesh,
                    policy.axis_name, interpret=interp)
                return cz(v2, n), (raw / (n ** 3)).astype(cfg.dtype)

            u1, err0 = one_sharded(lu)

            def scond(state):
                _, _, slope, k = state
                return jnp.logical_and(
                    slope > cfg.trigger,
                    k < max_sweeps)

            def sbody(state):
                v, prev, _, k = state
                v2, err = one_sharded(v)
                return v2, err, jnp.abs(err - prev), k + 1

            init_s = (u1, err0, jnp.asarray(cfg.trigger + 1.0, err0.dtype),
                      jnp.asarray(1, jnp.int32))

            # batched sharded passes (round 5): per-iterate metric partials
            # from sharded_fused_jacobi3_errs; the batch's steps(+1 clean)
            # halo ring must fit the planes/device ppermute bound. AUTO
            # additionally engages only at sizes where the UNSHARDED
            # engine would also auto-batch (above the whole-loop kernel
            # tiers) — a sharded run must not silently trade the exact
            # stop semantics its single-chip twin keeps (the cross-policy
            # bit-match contract, tests/test_compiled3_policy.py)
            nl_ = policy.padded_depth(n) // policy.n_devices
            B = min(cfg.trigger_batch
                    if isinstance(cfg.trigger_batch, int)
                    else p3k.errs3_sweep_cap(compat),
                    p3k.errs3_sweep_cap(compat))
            while B > 1 and (B if compat == "gpu" else B + 1) > nl_:
                B -= 1
            auto_ok = not (p3k.trigger3_fits(n)
                           or p3k.trigger3_stream_fits(n))

            def sbatch_step(v, prev):
                v, errs = ps3.sharded_fused_jacobi3_errs(
                    v, lf, n, h, B, cfg.omega, compat, policy.mesh,
                    policy.axis_name, interpret=interp)
                v = cz(v, n)
                prevs = jnp.concatenate([prev[None], errs[:-1]])
                stop = jnp.abs(errs - prevs) <= cfg.trigger
                found = jnp.any(stop)
                err = jnp.where(found, errs[jnp.argmax(stop)], errs[-1])
                return v, errs[-1], found, err

            def sbatched_from(v, e1, k):
                def cond2(state):
                    _, _, found, _, kk = state
                    return jnp.logical_and(jnp.logical_not(found),
                                           kk < max_sweeps)

                def body2(state):
                    v, last, _, _, kk = state
                    v, last, found, err = sbatch_step(v, last)
                    return v, last, found, err, kk + B

                v, last, found, err = sbatch_step(v, e1)
                v, _, _, err, _ = jax.lax.while_loop(
                    cond2, body2, (v, last, found, err, k + B))
                return v, err

            if (isinstance(cfg.trigger_batch, int)
                    and cfg.trigger_batch > 1 and B > 1):
                # explicit batch: always-batched (overshoot semantics)
                return sbatched_from(u1, err0, jnp.asarray(1, jnp.int32))

            if cfg.trigger_batch == "auto" and B > 1 and auto_ok:
                # auto two-phase: exact per-sweep warmup, batch only a
                # loop that outlives it (the unsharded tail's twin)
                warm = min(2 * B, max_sweeps)

                def cond1(state):
                    _, _, slope, k = state
                    return jnp.logical_and(slope > cfg.trigger, k < warm)

                u2, err2, slope2, k2 = jax.lax.while_loop(
                    cond1, sbody, init_s)
                done = jnp.logical_or(slope2 <= cfg.trigger,
                                      k2 >= max_sweeps)
                return jax.lax.cond(
                    done, lambda a: (a[0], a[1]),
                    lambda a: sbatched_from(*a), (u2, err2, k2))

            u_out, err, _, _ = jax.lax.while_loop(scond, sbody, init_s)
            return u_out, err

        if p3k.trigger3_fits(n):
            # the WHOLE trigger loop as one VMEM-resident kernel (volumes
            # ≤ ~129³): no HBM traffic / dispatch per sweep; identical stop
            # rule and metrics. Supersedes trigger_batch at these sizes.
            return p3k.fused_trigger3_vmem(
                lu, lf, n, h, cfg.trigger, cfg.omega, compat,
                max_sweeps, interpret=interp)

        if p3k.trigger3_stream_fits(n):
            # next size class (257³): only the ITERATE fits VMEM — keep u
            # resident across the whole loop and stream f in plane blocks
            # once per sweep (one HBM pass + zero dispatch per sweep vs the
            # per-pass path's ~3 + 1; the 2-D stream kernel one dim up)
            return p3k.fused_trigger3_stream(
                lu, lf, n, h, cfg.trigger, cfg.omega, compat,
                max_sweeps, interpret=interp)

        if isinstance(cfg.trigger_batch, int) and cfg.trigger_batch > 1:
            B = min(cfg.trigger_batch, p3k.errs3_sweep_cap(compat))

            def batch_step(v, prev):
                v, errs = p3k.fused_jacobi3_errs_padded(
                    v, lf, n, h, B, omega=cfg.omega, compat=compat,
                    interpret=interp)
                prevs = jnp.concatenate([prev[None], errs[:-1]])
                stop = jnp.abs(errs - prevs) <= cfg.trigger
                found = jnp.any(stop)
                err = jnp.where(found, errs[jnp.argmax(stop)], errs[-1])
                return v, errs[-1], found, err

            # prev = +inf masks the (never-tested) slope of sweep 1
            u, last, found, err = batch_step(
                lu, jnp.asarray(jnp.inf, cfg.dtype))

            def bcond(state):
                _, _, found, _, k = state
                return jnp.logical_and(jnp.logical_not(found),
                                       k < max_sweeps)

            def bbody(state):
                v, last, _, _, k = state
                v, last, found, err = batch_step(v, last)
                return v, last, found, err, k + B

            u, _, _, err, _ = jax.lax.while_loop(
                bcond, bbody, (u, last, found, err,
                               jnp.asarray(B, jnp.int32)))
            return u, err

        def one(u):
            u2, raw = p3k.fused_jacobi3_padded(u, lf, n, h, 1,
                                               omega=cfg.omega,
                                               interpret=interp,
                                               err_mode=mode)
            return u2, (raw / (n ** 3)).astype(cfg.dtype)

        u1, err0 = one(lu)

        def cond(state):
            _, _, slope, k = state
            return jnp.logical_and(slope > cfg.trigger, k < max_sweeps)

        def body(state):
            u, prev, _, k = state
            u2, err = one(u)
            return u2, err, jnp.abs(err - prev), k + 1

        init = (u1, err0, jnp.asarray(cfg.trigger + 1.0, err0.dtype),
                jnp.asarray(1, jnp.int32))

        if cfg.trigger_batch != "auto":
            u, err, _, _ = jax.lax.while_loop(cond, body, init)
            return u, err

        # AUTO two-phase (VERDICT r4 weak 2; the 2-D engine's twin): the
        # first 2·B sweeps run the exact per-sweep loop — early-stop
        # levels reproduce trigger_batch=1 bit-for-bit — then a loop
        # still running switches to B-sweep batched passes (the measured
        # 1.42× many-sweep win at 513³, BASELINE "3-D fused error").
        B = p3k.errs3_sweep_cap(compat)
        warm = min(2 * B, max_sweeps)

        def cond1(state):
            _, _, slope, k = state
            return jnp.logical_and(slope > cfg.trigger, k < warm)

        u2, err2, slope2, k2 = jax.lax.while_loop(cond1, body, init)
        done = jnp.logical_or(slope2 <= cfg.trigger, k2 >= max_sweeps)

        def batch_step(v, prev):
            v, errs = p3k.fused_jacobi3_errs_padded(
                v, lf, n, h, B, omega=cfg.omega, compat=compat,
                interpret=interp)
            prevs = jnp.concatenate([prev[None], errs[:-1]])
            stop = jnp.abs(errs - prevs) <= cfg.trigger
            found = jnp.any(stop)
            err = jnp.where(found, errs[jnp.argmax(stop)], errs[-1])
            return v, errs[-1], found, err

        def phase2(args):
            v, e1, k = args

            def cond2(state):
                _, _, found, _, kk = state
                return jnp.logical_and(jnp.logical_not(found),
                                       kk < max_sweeps)

            def body2(state):
                v, last, _, _, kk = state
                v, last, found, err = batch_step(v, last)
                return v, last, found, err, kk + B

            v, last, found, err = batch_step(v, e1)
            v, _, _, err, _ = jax.lax.while_loop(
                cond2, body2, (v, last, found, err, k + B))
            return v, err

        return jax.lax.cond(done, lambda a: (a[0], a[1]), phase2,
                            (u2, err2, k2))

    def zeros_level(n):
        if use_pallas:
            nz, rp, cp = p3k.padded_shape3(n)
            return cz(jnp.zeros((zp_of(n), rp, cp), cfg.dtype), n)
        return cz(jnp.zeros((n,) * 3, cfg.dtype), n)

    def zero_interior(lu, n):
        """Re-zero the correction interior, keeping the Dirichlet border."""
        if use_pallas:
            nz, rp, cp = lu.shape
            z = jnp.arange(nz).reshape(nz, 1, 1)
            r = jnp.arange(rp).reshape(1, rp, 1)
            c = jnp.arange(cp).reshape(1, 1, cp)
            interior = ((z >= 1) & (z <= n - 2) & (r >= 1) & (r <= n - 2)
                        & (c >= 1) & (c <= n - 2))
            return jnp.where(interior, jnp.zeros_like(lu), lu)
        return jnp.where(
            jnp.zeros((n,) * 3, bool).at[1:-1, 1:-1, 1:-1].set(True),
            jnp.zeros_like(lu), lu)

    # stack of (spec, u, f, is_fmg); mirrors Solver3D.run
    if use_pallas:
        u, f = to_p(u, spec0.n), to_p(f, spec0.n)
    elif policy is not None:
        u, f = cz(u, spec0.n), cz(f, spec0.n)
    levels = [(spec0, u, f, False)]
    first_descend_done = warm
    last_err = jnp.zeros((), cfg.dtype)

    for ins in program.instructions:
        spec, lu, lf, is_fmg = levels[-1]
        n, h = spec.n, spec.h

        if isinstance(ins, Descend):
            finest = len(levels) == 1
            if not (finest and first_descend_done) and not is_fmg:
                if finest:
                    lu = zero_interior(lu, n)  # keep Dirichlet border
                else:
                    lu = zeros_level(n)

            next_spec = spec.coarsened(ins.next_n)
            aligned = n == 2 * ins.next_n - 1
            if ins.steps == 0:  # FMG descent
                from .ops.zoom import zoom3

                lf_raw = from_p(lf, n) if use_pallas else lf
                f_c = zoom3(lf_raw, ins.next_n, zero_boundary=True)
                f_c = f_c + problem.boundary_grid(next_spec.n, cfg.dtype)
                if use_pallas:
                    f_c = to_p(f_c, next_spec.n)
                else:
                    f_c = cz(f_c, next_spec.n)
                levels[-1] = (spec, lu, lf, is_fmg)
                levels.append((next_spec, zeros_level(next_spec.n), f_c,
                               True))
                continue

            # sharded level: per-shard descend leg (one kernel + one
            # plane-halo exchange per shard) when the shard geometry
            # admits it, else per-shard smooth+residual + the depth-aware
            # einsum restriction
            if sharded(n):
                m = ins.next_n
                fz_s = (not finest) and (not is_fmg)
                k_nb = ins.steps - (1 if fz_s else 0)
                nl = zp_of(n) // policy.n_devices
                fw = cfg.restriction == "full_weighting"
                cap = (p3k.MAX_DESCEND3_SWEEPS_FW if fw
                       else p3k.MAX_DESCEND3_SWEEPS_SAMPLING)
                z_halo = k_nb + (2 if fw else 1)
                if (aligned and ins.steps >= 1 and compat == "clean"
                        and 0 <= k_nb <= cap and z_halo <= nl):
                    use_rdma_leg = False
                    if cfg.halo == "rdma":
                        from .ops.pallas_rdma3 import rdma_descend3_fits
                        _, rp_, cp_ = p3k.padded_shape3(n)
                        use_rdma_leg = rdma_descend3_fits(
                            nl, rp_, cp_, ins.steps, fz_s,
                            jnp.dtype(cfg.dtype).itemsize, fw)
                    if use_rdma_leg:
                        # whole leg with IN-KERNEL remote-DMA plane halos:
                        # interior bricks sweep+restrict while the wires
                        # are busy (bit-matches the ppermute leg)
                        lu, dw, err_raw = ps3.rdma_fused_descend3(
                            lu, lf, n, h, ins.steps, cfg.omega,
                            policy.mesh, policy.axis_name, from_zero=fz_s,
                            restriction=cfg.restriction, interpret=interp)
                    else:
                        lu, dw, err_raw = ps3.sharded_fused_descend3(
                            lu, lf, n, h, ins.steps, cfg.omega, policy.mesh,
                            policy.axis_name, from_zero=fz_s,
                            restriction=cfg.restriction, interpret=interp)
                    f_c = cz(conform_z(pd3.restrict3_lanes_p(dw, n, m),
                                       zp_of(m)), m)
                    last_err = (err_raw / (n ** 3)).astype(cfg.dtype)
                else:
                    lu, last_err = smooth(lu, lf, n, h, ins.steps)
                    if aligned:
                        rneg = ps3.sharded_residual3_pallas(
                            lu, lf, n, h, policy.mesh, policy.axis_name,
                            negate=True, interpret=interp)
                        f_c = cz(pd3.restrict3_p(rneg, n, m,
                                                 mode=cfg.restriction,
                                                 zp_out=zp_of(m)), m)
                    else:
                        f_c = to_p(_restrict_residual3(
                            from_p(lu, n), from_p(lf, n), h, m,
                            restriction=cfg.restriction), m)
                levels[-1] = (spec, cz(lu, n), lf, is_fmg)
                levels.append((next_spec, zeros_level(m), f_c, False))
                continue

            # ONE-kernel descend leg: sweeps + residual + z/row restriction
            # + the fused clean-metric error partial in a single HBM pass
            # (2-D analog: compiled._fuse_descend_ok)
            fz = (not finest) and (not is_fmg)
            fuse_down = (use_pallas and aligned and n >= _PALLAS3_MIN_N
                         and ins.steps >= 1 and compat == "clean"
                         and cfg.smoother == "jacobi")
            if fuse_down:
                cap = (p3k.MAX_DESCEND3_SWEEPS_FW
                       if cfg.restriction == "full_weighting"
                       else p3k.MAX_DESCEND3_SWEEPS_SAMPLING)
                fuse_down = ins.steps - (1 if fz else 0) <= cap
            if fuse_down:
                lu, dw, err_raw = p3k.fused_descend3_padded(
                    lu, lf, n, h, ins.steps, omega=cfg.omega, from_zero=fz,
                    restriction=cfg.restriction, interpret=interp)
                f_c = cz(pd3.restrict3_lanes_p(dw, n, ins.next_n),
                         ins.next_n)
                last_err = (err_raw[0, 0] / (n ** 3)).astype(cfg.dtype)
                levels[-1] = (spec, lu, lf, is_fmg)
                levels.append((next_spec, zeros_level(next_spec.n), f_c,
                               False))
                continue

            lu, last_err = smooth(lu, lf, n, h, ins.steps)
            if use_pallas and aligned and n >= _PALLAS3_MIN_N:
                rpad = p3k.residual3_pallas(lu, lf, n, h, negate=True,
                                            interpret=interp)
                f_c = cz(pd3.restrict3_p(rpad, n, ins.next_n,
                                         mode=cfg.restriction), ins.next_n)
            elif use_pallas:
                f_c = to_p(_restrict_residual3(
                    from_p(lu, n), from_p(lf, n), h, ins.next_n,
                    restriction=cfg.restriction), ins.next_n)
            else:
                f_c = cz(_restrict_residual3(lu, lf, h, ins.next_n,
                                             restriction=cfg.restriction),
                         ins.next_n)
            levels[-1] = (spec, lu, lf, is_fmg)
            levels.append((next_spec, zeros_level(next_spec.n), f_c, False))

        elif isinstance(ins, CoarseSolve):
            lf_raw = from_p(lf, n) if use_pallas else lf
            if ins.option == 0:
                lu = p3.dense_solve3(lf_raw, h)
            else:
                if ins.option == 2:
                    dtype = jnp.float32
                elif ins.option == 1 and jax.config.jax_enable_x64:
                    dtype = jnp.float64
                else:
                    dtype = cfg.dtype
                us, last_err, _ = p3.gauss_seidel_solve3(
                    lf_raw.astype(dtype), h, ins.target_error,
                    norm=cfg.coarse_gs_norm)
                lu = us.astype(cfg.dtype)
            if use_pallas:
                lu = to_p(lu, n)
            else:
                lu = cz(lu, n)
            levels[-1] = (spec, lu, lf, is_fmg)

        elif isinstance(ins, Ascend):
            child_spec, cu, _, _ = levels.pop()
            spec, lu, lf, is_fmg = levels[-1]
            n, h = spec.n, spec.h
            m = child_spec.n
            aligned = n == 2 * m - 1
            # sharded level: per-shard ascend leg (lane-expand einsum +
            # one kernel + two plane-halo exchanges per shard) when the
            # shard geometry admits it; the coarse correction is conformed
            # to EXACTLY half the fine depth (the leg's parity contract)
            if sharded(n):
                nl = zp_of(n) // policy.n_devices
                ext_z = ins.steps + (ins.steps % 2)
                if (aligned and 1 <= ins.steps <= p3k.MAX_FUSED_SWEEPS_3D
                        and compat == "clean"
                        and ext_z <= nl and ext_z // 2 + 1 <= nl // 2):
                    zsh = policy.sharding(n)
                    ec = jax.lax.with_sharding_constraint(
                        conform_z(cu, zp_of(n) // 2), zsh)
                    cw = jax.lax.with_sharding_constraint(
                        pd3.prolong3_lanes_p(ec, n, m), zsh)
                    # last-node error fuses into the ascend kernel itself
                    # when the +1 err halo ring still fits the shard depth
                    zh = ins.steps + 1
                    ze = zh + (zh % 2)
                    want_err = (ins is program.instructions[-1]
                                and ins.steps <= 7 and ze <= nl
                                and ze // 2 + 1 <= nl // 2)
                    up_fn = ps3.sharded_fused_ascend3
                    if cfg.halo == "rdma":
                        from .ops.pallas_rdma3 import rdma_ascend3_fits
                        _, rp_, cp_ = p3k.padded_shape3(n)
                        if rdma_ascend3_fits(nl, rp_, cp_, ins.steps,
                                             want_err,
                                             jnp.dtype(cfg.dtype).itemsize):
                            # whole leg with in-kernel remote-DMA u/f/cw
                            # halos (bit-matches the ppermute leg)
                            up_fn = ps3.rdma_fused_ascend3
                    if want_err:
                        lu, raw = up_fn(
                            lu, lf, cw, n, h, ins.steps, cfg.omega,
                            policy.mesh, policy.axis_name,
                            err_mode="clean", interpret=interp)
                        lu = cz(lu, n)
                        last_err = (raw / (n ** 3)).astype(cfg.dtype)
                    else:
                        lu = cz(up_fn(
                            lu, lf, cw, n, h, ins.steps, cfg.omega,
                            policy.mesh, policy.axis_name,
                            interpret=interp), n)
                        if ins is program.instructions[-1]:
                            # one per-shard residual pass (GSPMD reduces
                            # the z-sharded |r| sum)
                            r = ps3.sharded_residual3_pallas(
                                lu, lf, n, h, policy.mesh, policy.axis_name,
                                interpret=interp)
                            last_err = (jnp.sum(jnp.abs(r))
                                        / (n ** 3)).astype(cfg.dtype)
                else:
                    if aligned:
                        lu = cz(pd3.prolong3_add_p(lu, cu, n, m,
                                                   interior_only=True), n)
                    else:
                        lu = to_p(_prolong_add3(from_p(cu, m),
                                                from_p(lu, n), n), n)
                    if ins.steps != 0:
                        lu, last_err = smooth(lu, lf, n, h, ins.steps)
                if len(levels) == 1:
                    first_descend_done = True
                levels[-1] = (spec, lu, lf, is_fmg)
                continue
            # ONE-kernel ascend leg: prolong + add + post-sweeps in a single
            # HBM pass (2-D analog: compiled._fuse_ascend_ok). The error
            # metric is only materialized when this node's err is the
            # program's return value (one extra residual pass at the end).
            fuse_up = (use_pallas and aligned and n >= _PALLAS3_MIN_N
                       and 1 <= ins.steps <= p3k.MAX_FUSED_SWEEPS_3D
                       and compat == "clean" and cfg.smoother == "jacobi")
            if fuse_up:
                cw = pd3.prolong3_lanes_p(cu, n, m)
                # the error metric is only materialized when this node's err
                # is the program's return value — then it fuses into the
                # ascend kernel itself (steps ≤ 7; the 8-sweep edge case
                # keeps the separate residual pass)
                want_err = (ins is program.instructions[-1]
                            and ins.steps <= 7)
                if want_err:
                    lu, raw = p3k.fused_ascend3_padded(
                        lu, lf, cw, n, h, ins.steps, omega=cfg.omega,
                        interpret=interp, err_mode="clean")
                    last_err = (raw / (n ** 3)).astype(cfg.dtype)
                else:
                    lu = p3k.fused_ascend3_padded(lu, lf, cw, n, h,
                                                  ins.steps, omega=cfg.omega,
                                                  interpret=interp)
                    if ins is program.instructions[-1]:
                        r = p3k.residual3_pallas(lu, lf, n, h,
                                                 interpret=interp)
                        last_err = (jnp.sum(jnp.abs(r)) / (n ** 3)).astype(
                            cfg.dtype)
            else:
                if use_pallas and aligned and n >= _PALLAS3_MIN_N:
                    lu = pd3.prolong3_add_p(lu, cu, n, m, interior_only=True)
                elif use_pallas:
                    lu = to_p(_prolong_add3(from_p(cu, m), from_p(lu, n), n),
                              n)
                else:
                    lu = _prolong_add3(cu, lu, n)
                if ins.steps != 0:
                    lu, last_err = smooth(lu, lf, n, h, ins.steps)
            if len(levels) == 1:
                first_descend_done = True
            levels[-1] = (spec, lu, lf, is_fmg)
        else:
            raise TypeError(f"unknown instruction {ins!r}")

    u_out = levels[-1][1]
    if use_pallas:
        u_out = from_p(u_out, levels[-1][0].n)
    return u_out, last_err


@dataclasses.dataclass
class CompiledCycle3:
    """A CycleProgram traced into one jitted 3-D executable."""

    program: CycleProgram
    problem: Problem3D
    config: SolverConfig
    _fn: object
    _fn_warm: object
    policy: Optional[object] = None

    @property
    def finest_spec(self) -> GridSpec:
        p = self.program
        return GridSpec(p.n_max, p.length, p.min_x, p.min_y)

    def init(self):
        n = self.program.n_max
        dtype = self.config.dtype
        f = (self.problem.source_grid(n, dtype)
             + self.problem.boundary_grid(n, dtype))
        u = self.problem.boundary_grid(n, dtype)
        # no device_put here: the finest depth (n, odd) is not
        # device-divisible — the traced walk pads and constrains instead
        return u, f

    def __call__(self, u, f, warm: bool = False):
        return (self._fn_warm if warm else self._fn)(u, f)


def compile_program3(program: CycleProgram, problem: Problem3D,
                     config: SolverConfig = SolverConfig(),
                     policy=None, donate: bool = False) -> CompiledCycle3:
    """Build the one-XLA-program 3-D executable for ``program``.

    ``policy`` (parallel.pallas_shard3.ZShardingPolicy3) runs the program
    multi-chip under a z-plane decomposition: sharded levels keep their
    state partitioned and run the per-shard brick kernels/fused legs,
    coarser levels replicate (see _trace_program3)."""
    program.validate()

    def make(warm: bool):
        fn = partial(_trace_program3, program=program, problem=problem,
                     config=config, policy=policy, warm=warm)
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    return CompiledCycle3(program, problem, config, make(False), make(True),
                          policy)

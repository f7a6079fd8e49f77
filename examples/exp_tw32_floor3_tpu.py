"""3-D tw32 stagnation floor on hardware: tol=0 refinement at 129^3.

The 2-D floor law (examples/exp_tw32_floor.py) is 3.9e-24·(N−1)^1.99 —
the eps_tw·‖A‖-class bound. In 3-D ‖A‖ = 12/h² (vs 8/h²), so the same
bound predicts rel ≈ 2^-72·12·(N−1)²·‖u‖/‖f‖-class. This experiment runs
tol=0 to stagnation on the real chip and reports the floor.

Run: python examples/exp_tw32_floor3_tpu.py [n] [max_cycles]
"""
import sys
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from multigrid_poisson_solver_tpu.models import poisson3d as p3
from multigrid_poisson_solver_tpu.refine3 import IterativeRefinement3

n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 30

s = IterativeRefinement3(p3.REFERENCE_PROBLEM_3D, n, max_cycles=cycles,
                         state="tw32")
rep = s.solve(tol=0.0)
law2d = 3.9e-24 * (n - 1) ** 1.99
print(f"n={n}: rel residual after {rep.cycles} cycles: "
      f"{rep.rel_residual:.3e} (2-D law x1.5 for ||A||: {1.5*law2d:.3e})",
      flush=True)

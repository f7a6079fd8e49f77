"""tw32 stagnation floor on the REAL TPU at N=4097, tol=0 (ROADMAP r3 item 5
confirmation): the CPU floor law is 3.9e-24·(N-1)^2 (~6.5e-17 at 4097). If
the TPU run stalls orders of magnitude above that, the Pallas/Mosaic dd-EFT
residual chain (or the fp32 kernel path) is leaking precision."""
import jax
import jax.numpy as jnp

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.refine import IterativeRefinementSolver

N = 4097
s = IterativeRefinementSolver(mg.REFERENCE_PROBLEM, N, state="tw32",
                              max_cycles=25)
f = s.init_rhs()
u0, u1 = s.initial_state()
u2 = jnp.zeros_like(u0)
out = s._run(u0, u1, u2, f, 0.0, 25)
rel, k = float(jax.device_get(out[3])), int(jax.device_get(out[4]))
print(f"TPU N={N}: tw32 floor rel residual {rel:.3e} after {k} cycles "
      f"(CPU law predicts 6.5e-17)", flush=True)

"""DEV: sweep the runtime iteration cap of the pallas batched solver and
measure throughput + quality-vs-uncapped-golden at each point (r4 task 2).

The while_loop is lock-step: wall time tracks the MAX live iteration count,
so converged_frac ~0.88 at cap 50 means ~12% of lanes hold the whole batch
for the full 50.  This finds the knee.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
from learningagileflight_se3_tpu.models.sampler import (
    sample_scenarios, scenario_to_problem,
)
from learningagileflight_se3_tpu.solver.ilqr import make_batched_mpc_solver


def main():
    print(f"device {jax.devices()[0]}", flush=True)
    params_q, weights = QuadParams(), CostWeights()
    B = 2048
    cfg = SolverConfig(horizon=50, max_iters=50, tol=1e-4, gtol=3e-4,
                       ls_adaptive=True, ls_max_trips=4, no_progress_iters=10)
    golden_cfg = SolverConfig(horizon=50, max_iters=150, tol=1e-4, gtol=3e-4,
                              ls_adaptive=False, ls_max_trips=14)

    key = jax.random.PRNGKey(100)
    scen = sample_scenarios(key, B).astype(jnp.float32)
    probs = jax.vmap(scenario_to_problem)(scen)
    x0, goal = probs["x0"], probs["goal_pos"]
    u_last = jnp.zeros((B, 4), jnp.float32)
    tra_pos = jnp.zeros((B, 3), jnp.float32)
    tra_ang = jnp.concatenate(
        [jnp.zeros((B, 1)), scen[:, 8:9] * 0.5, jnp.zeros((B, 1))], axis=1
    ).astype(jnp.float32)
    t = jnp.clip(jnp.linalg.norm(x0[:, 0:3], axis=1) / 4.0, 2.0, 4.0
                 ).astype(jnp.float32)
    args = (x0, u_last, goal, tra_pos, tra_ang, t)

    solve = jax.jit(make_batched_mpc_solver(params_q, weights, cfg),
                    static_argnames=())
    solve_g = jax.jit(make_batched_mpc_solver(params_q, weights, golden_cfg))
    sg = solve_g(*args)
    Jg = np.asarray(sg.cost)
    print(f"golden done {float(np.asarray(sg.converged).mean()):.4f}")

    for mi in (24, 28, 32, 36, 40, 45, 50):
        sol = solve(*args, max_iters=jnp.asarray(mi, jnp.int32))
        np.asarray(sol.cost)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sol = solve(*args, max_iters=jnp.asarray(mi, jnp.int32))
            np.asarray(sol.control_traj)
            times.append(time.perf_counter() - t0)
        J = np.asarray(sol.cost)
        ex = (J - Jg) / np.maximum(np.abs(Jg), 1e-6)
        sps = B / min(times)
        print(f"cap {mi:3d}: {sps:8.1f} solves/s sync  conv "
              f"{float(np.asarray(sol.converged).mean()):.4f}  "
              f"iters {float(np.asarray(sol.iterations).mean()):.1f}  "
              f"ls {int(sol.ls_evals)}  "
              f"excess med {np.median(ex):.1e} q90 {np.percentile(ex,90):.1e} "
              f"q99 {np.percentile(ex,99):.1e} frac<1% {(ex<0.01).mean():.4f}",
              flush=True)


if __name__ == "__main__":
    main()

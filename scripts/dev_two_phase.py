"""DEV: two-phase compaction experiment (r4 task 2).

Phase 1: full batch (2048) at a low cap.  Phase 2: gather the worst lanes
into a compact half/quarter batch and continue them warm-started.  Lane-
iterations (≈ wall time) stay level with the single-phase cap-50 bench while
hard lanes get up to 70+ iterations.  Measures time + quality vs the TRUE
uncapped golden for several (cap1, n2, cap2) splits.
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
    cfg = SolverConfig(horizon=50, max_iters=150, tol=1e-4, gtol=3e-4,
                       ls_adaptive=True, ls_max_trips=4, no_progress_iters=8)
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

    solve = jax.jit(make_batched_mpc_solver(params_q, weights, cfg))
    solve_g = jax.jit(make_batched_mpc_solver(params_q, weights, golden_cfg))
    sg = solve_g(*args)
    Jg = np.asarray(sg.cost)
    print(f"golden done {float(np.asarray(sg.converged).mean()):.4f}")

    def quality(J, label, elapsed, extra=""):
        ex = (J - Jg) / np.maximum(np.abs(Jg), 1e-6)
        print(f"{label}: {elapsed:.3f}s ({B/elapsed:.0f} sps) "
              f"excess med {np.median(ex):.1e} q90 {np.percentile(ex,90):.1e} "
              f"q99 {np.percentile(ex,99):.1e} frac<1e-3 {(ex<1e-3).mean():.4f} "
              f"frac<1% {(ex<0.01).mean():.4f} {extra}", flush=True)

    # ---- single-phase baselines ----
    for cap in (50,):
        sol = solve(*args, max_iters=jnp.asarray(cap, jnp.int32))
        np.asarray(sol.cost)
        t0 = time.perf_counter()
        sol = solve(*args, max_iters=jnp.asarray(cap, jnp.int32))
        J = np.asarray(sol.cost)
        el = time.perf_counter() - t0
        quality(J, f"single cap{cap}", el,
                f"conv {float(np.asarray(sol.converged).mean()):.3f} "
                f"iters {float(np.asarray(sol.iterations).mean()):.1f}")

    # ---- two-phase variants ----
    @jax.jit
    def gather_args(idx, U):
        return (x0[idx], u_last[idx], goal[idx], tra_pos[idx], tra_ang[idx],
                t[idx], U[idx])

    for cap1, n2, cap2 in ((30, 1024, 40), (30, 1024, 60), (24, 1024, 50),
                           (30, 512, 60), (36, 768, 45)):
        # warm everything once for compile
        s1 = solve(*args, max_iters=jnp.asarray(cap1, jnp.int32))
        np.asarray(s1.cost)
        # rank lanes: unconverged first, ties by iteration count
        conv1 = np.asarray(s1.converged)
        order = np.argsort(conv1.astype(np.int32))  # stable: unconverged first
        idx = jnp.asarray(np.sort(order[:n2]))
        a2 = gather_args(idx, s1.control_traj)
        s2 = solve(*a2[:6], U_init=a2[6], max_iters=jnp.asarray(cap2, jnp.int32))
        np.asarray(s2.cost)

        t0 = time.perf_counter()
        s1 = solve(*args, max_iters=jnp.asarray(cap1, jnp.int32))
        conv1 = np.asarray(s1.converged)
        order = np.argsort(conv1.astype(np.int32))
        idx_np = np.sort(order[:n2])
        idx = jnp.asarray(idx_np)
        a2 = gather_args(idx, s1.control_traj)
        s2 = solve(*a2[:6], U_init=a2[6], max_iters=jnp.asarray(cap2, jnp.int32))
        J2 = np.asarray(s2.cost)
        el = time.perf_counter() - t0

        J = np.asarray(s1.cost).copy()
        better = J2 < J[idx_np]  # keep phase-2 only where it improved
        J[idx_np] = np.where(better, J2, J[idx_np])
        conv = conv1.copy()
        conv[idx_np] = conv[idx_np] | np.asarray(s2.converged)
        n_unconv1 = int((~conv1).sum())
        quality(J, f"two-phase {cap1}+{n2}x{cap2}", el,
                f"conv {conv.mean():.3f} (phase1 unconv {n_unconv1})")


if __name__ == "__main__":
    main()

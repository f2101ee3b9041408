"""Latency benchmark: one closed-loop MPC control query against the 10 Hz
replanning budget.

The reference replans at 10 Hz, giving each IPOPT solve a 100 ms real-time
budget on one CPU core (BASELINE.md; main.py:76).  This measures the same
query on the current accelerator — a single warm-started H=50 solve, the
`run_quad.get_input` role (quad_policy.py:202-211) — and reports how many
times over that budget we are.

Prints ONE JSON line:
  {"metric": "mpc_query_latency", "value": <seconds>, "unit": "s",
   "vs_baseline": <0.1 / value>, ...}
vs_baseline = 20 means the solve fits a 200 Hz replanning loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
    from learningagileflight_se3_tpu.models.sampler import (
        sample_scenarios,
        scenario_to_problem,
    )
    from learningagileflight_se3_tpu.solver.ilqr import make_batched_mpc_solver

    log(f"device: {jax.devices()[0]}  platform: {jax.default_backend()}")
    params_q, weights = QuadParams(), CostWeights()
    # deployment budget: warm-started receding-horizon queries converge in a
    # few sweeps (each 10 Hz tick moves the problem only slightly); a
    # 5-iteration cap bounds worst-case latency
    cfg = SolverConfig(horizon=50, max_iters=5, tol=1e-4, gtol=3e-4)
    solve = jax.jit(make_batched_mpc_solver(params_q, weights, cfg))

    # ONE scenario, replicated to the DEPLOYMENT tile: batch-1 arrays hit a
    # pathological XLA layout on TPU (~4x slower for the same
    # sequential-depth-bound program), so the deployment path pads single
    # queries to a tile and reads row 0.  On TPU the tile is 128 — the
    # fused-Pallas lane width ExternalSimController ships with (a 128-lane
    # DDP iteration costs the same wall time as the xla tile-8 path costs
    # per ~4 iterations); elsewhere a small tile avoids the batch-1 layout
    # at low cost.
    B = 128 if jax.default_backend() == "tpu" else 8
    scen = jnp.tile(sample_scenarios(jax.random.PRNGKey(3), 1), (B, 1)).astype(jnp.float32)
    prob = jax.vmap(scenario_to_problem)(scen)
    tra_ang = jnp.concatenate(
        [jnp.zeros((B, 1)), scen[:, 8:9] * 0.5, jnp.zeros((B, 1))], axis=1
    ).astype(jnp.float32)
    t = jnp.clip(
        jnp.linalg.norm(prob["x0"][:, 0:3], axis=1) / 4.0, 2.0, 4.0
    ).astype(jnp.float32)
    args = [prob["x0"].astype(jnp.float32), jnp.zeros((B, 4), jnp.float32),
            prob["goal_pos"].astype(jnp.float32), jnp.zeros((B, 3), jnp.float32),
            tra_ang, t]

    sol = solve(*args)  # compile + cold solve
    np.asarray(sol.control_traj)  # fetch-sync: reliable barrier under axon

    # warm-started receding-horizon queries: shift the previous plan one step
    # (what ExternalSimController does between 10 Hz ticks)
    lat = []
    U_warm = sol.control_traj
    for i in range(50):
        U_warm = jnp.concatenate([U_warm[:, 1:], U_warm[:, -1:]], axis=1)
        t0 = time.perf_counter()
        sol = solve(*args, U_init=U_warm)
        np.asarray(sol.control_traj)
        lat.append(time.perf_counter() - t0)
        U_warm = sol.control_traj
    lat = np.asarray(lat[5:])  # drop warmup jitter
    log(f"warm-start latency: median {np.median(lat)*1e3:.2f} ms  "
        f"p90 {np.percentile(lat, 90)*1e3:.2f} ms  max {lat.max()*1e3:.2f} ms")

    # regression guard for the tile workaround (VERDICT r1 weak #7): also
    # time the RAW batch-1 path.  If XLA ever fixes the batch-1 layout the
    # pad becomes removable (pad_speedup ~ 1); if batch-1 regresses further
    # the padded deployment path keeps the 10 Hz budget honest.
    args1 = [a[:1] for a in args]
    sol1 = solve(*args1)
    np.asarray(sol1.control_traj)
    lat1 = []
    U1 = sol1.control_traj
    for i in range(20):
        U1 = jnp.concatenate([U1[:, 1:], U1[:, -1:]], axis=1)
        t0 = time.perf_counter()
        sol1 = solve(*args1, U_init=U1)
        np.asarray(sol1.control_traj)
        lat1.append(time.perf_counter() - t0)
        U1 = sol1.control_traj
    lat1 = np.asarray(lat1[3:])
    log(f"raw batch-1 latency: median {np.median(lat1)*1e3:.2f} ms")

    value = float(np.median(lat))
    out = {
        "metric": "mpc_query_latency",
        "value": round(value, 6),
        "unit": "s",
        "vs_baseline": round(0.1 / value, 2),
        "p90_s": round(float(np.percentile(lat, 90)), 6),
        "batch1_median_s": round(float(np.median(lat1)), 6),
        "pad_speedup": round(float(np.median(lat1) / value), 2),
        "horizon": cfg.horizon,
        "platform": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Accuracy benchmark: control-sequence MAE vs the converged f64 oracle.

The BASELINE.md accuracy target: MAE < 1e-3 against the reference solver on
the same H=50 problem (the role CasADi/IPOPT plays for the reference; this
image has no casadi, so the oracle is the independent f64 L-BFGS-B shooting
solver in oracle/shooting.py, cross-validated in tests/test_solver.py).

Runs on CPU with x64 (the accuracy surface).  Prints ONE JSON line:
  {"metric": "control_mae_vs_oracle", "value": <mean MAE over scenarios>,
   "unit": "N", "vs_baseline": <1e-3 / value>, ...}
vs_baseline > 1 means better (smaller error) than the target.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n_scenarios: int = 8):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
    from learningagileflight_se3_tpu.models.sampler import (
        sample_scenarios,
        scenario_to_problem,
    )
    from learningagileflight_se3_tpu.oracle.shooting import solve_shooting_oracle
    from learningagileflight_se3_tpu.solver.ilqr import make_mpc_solver

    params_q, weights = QuadParams(), CostWeights()
    cfg = SolverConfig(horizon=50, max_iters=200)
    solve = jax.jit(make_mpc_solver(params_q, weights, cfg))

    scen = np.asarray(sample_scenarios(jax.random.PRNGKey(7), n_scenarios))
    maes, gaps = [], []
    for i in range(n_scenarios):
        prob = scenario_to_problem(jnp.asarray(scen[i]))
        tra_ang = jnp.array([0.0, float(scen[i, 8]) * 0.5, 0.0])
        t = float(np.clip(np.linalg.norm(np.asarray(prob["x0"])[0:3]) / 4.0, 2.0, 4.0))
        args = (
            prob["x0"], jnp.zeros(4), prob["goal_pos"],
            jnp.zeros(3), tra_ang, jnp.asarray(t),
        )
        sol = solve(*args)
        X, U, cost, _ = solve_shooting_oracle(
            params_q, weights, cfg,
            *[np.asarray(a) for a in args],
            U_init=np.asarray(sol.control_traj), maxiter=3000,
        )
        mae = float(np.mean(np.abs(np.asarray(sol.control_traj) - U)))
        gap = float(sol.cost) - cost
        maes.append(mae)
        gaps.append(gap)
        log(f"scenario {i}: MAE {mae:.2e}  cost gap {gap:+.2e}  "
            f"converged {bool(sol.converged)}")

    value = float(np.mean(maes))
    out = {
        "metric": "control_mae_vs_oracle",
        "value": value,
        "unit": "N",
        "vs_baseline": round(1e-3 / value, 2) if value > 0 else float("inf"),
        "max_mae": float(np.max(maes)),
        "n_scenarios": n_scenarios,
        "horizon": cfg.horizon,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Accuracy benchmark: COLD-START control-sequence MAE vs the lifted-NLP
oracle.

The BASELINE.md accuracy target: MAE < 1e-3 against the reference solver on
the same H=50 problem (the role CasADi/IPOPT plays for the reference; this
image has no casadi, so the oracle is oracle/lifted_nlp.py — the reference's
lifted multiple-shooting formulation, quad_OC.py:125-174, solved to ~1e-11
KKT residual by an independent L-BFGS-B -> interior-point -> Newton-crossover
cascade).  BOTH solvers start cold from the reference's midpoint-controls
init (quad_OC.py:142); nothing is warm-started from the solver under test,
so this is a genuine independent-basin measurement (VERDICT r2 item 3).

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
    from learningagileflight_se3_tpu.oracle import solve_lifted_oracle
    from learningagileflight_se3_tpu.solver.ilqr import make_mpc_solver

    params_q, weights = QuadParams(), CostWeights()
    # w_bound=inf: the production solver config enforces no omega box
    # (matching apples to apples; the omega-box parity check is
    # tests/test_oracle_lifted.py::test_omega_box_parity_vs_hard_bound_oracle)
    cfg = SolverConfig(horizon=50, max_iters=300, w_bound=float("inf"))
    solve = jax.jit(make_mpc_solver(params_q, weights, cfg))

    scen = np.asarray(sample_scenarios(jax.random.PRNGKey(7), n_scenarios))
    maes, gaps, kkts = [], [], []
    for i in range(n_scenarios):
        prob = scenario_to_problem(jnp.asarray(scen[i]))
        tra_ang = jnp.array([0.0, float(scen[i, 8]) * 0.5, 0.0])
        t = float(np.clip(np.linalg.norm(np.asarray(prob["x0"])[0:3]) / 4.0, 2.0, 4.0))
        args = (
            prob["x0"], jnp.zeros(4), prob["goal_pos"],
            jnp.zeros(3), tra_ang, jnp.asarray(t),
        )
        sol = solve(*args)  # cold: U_init=None -> midpoint (quad_OC.py:142)
        lifted = solve_lifted_oracle(
            params_q, weights, cfg,
            *[np.asarray(a) for a in args],
            maxiter=8000,
        )
        mae = float(np.mean(np.abs(np.asarray(sol.control_traj)
                                   - lifted.control_traj)))
        gap = (float(sol.cost) - lifted.cost) / abs(lifted.cost)
        maes.append(mae)
        gaps.append(gap)
        kkts.append(lifted.kkt_residual)
        log(f"scenario {i}: cold MAE {mae:.2e}  rel cost gap {gap:+.2e}  "
            f"oracle kkt {lifted.kkt_residual:.1e}  "
            f"converged {bool(sol.converged)}")

    value = float(np.mean(maes))
    out = {
        "metric": "control_mae_vs_oracle",
        "value": value,
        "unit": "N",
        "vs_baseline": round(1e-3 / value, 2) if value > 0 else float("inf"),
        "max_mae": float(np.max(maes)),
        "max_rel_cost_gap": float(np.max(np.abs(gaps))),
        "max_oracle_kkt": float(np.max(kkts)),
        "cold_start": True,
        "oracle": "lifted_nlp cascade (shooting -> ipm -> newton crossover)",
        "n_scenarios": n_scenarios,
        "horizon": cfg.horizon,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

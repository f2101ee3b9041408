"""Compiled-Pallas vs XLA-vmap cross-check ON REAL TPU HARDWARE.

tests/test_pallas.py proves kernel==scan equality in interpret mode on CPU;
this check closes the remaining gap (VERDICT r2 weak item 4): the MOSAIC-
compiled kernels could in principle diverge from their interpret-mode
semantics, and nothing asserted otherwise.  Runs one batch through BOTH
batched backends on the current accelerator:

  * pallas  — fused Riccati/boxQP backward + fused rollout kernels
  * xla     — vmap of the single-problem reference path

and emits agreement stats as ONE JSON line (committed as
artifacts/pallas_tpu_check.json).  Exits non-zero when agreement fails.

Two measurement lessons baked in (first found by this check):

  1. The XLA comparison path must run at matmul precision "highest" — at
     the TPU default, XLA lowers the 17x17 f32 matmuls to bf16 MXU passes
     and diverges from the kernel's explicit f32 VPU arithmetic by up to
     16% in cost (i.e. the PALLAS path is the more precise one).
  2. Agreement is asserted AT CONVERGENCE, lane-wise: mid-path iterates of
     a nonconvex solver amplify f32 reassociation noise chaotically, and a
     few percent of lanes legitimately land in different local basins; the
     gates are median-agreement + a large-majority same-basin fraction.

Usage: python benchmarks/check_pallas_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from learningagileflight_se3_tpu.config import (
        CostWeights, QuadParams, SolverConfig,
    )
    from learningagileflight_se3_tpu.models.sampler import (
        sample_scenarios, scenario_to_problem,
    )
    from learningagileflight_se3_tpu.solver.ilqr import make_batched_mpc_solver

    platform = jax.default_backend()
    log(f"platform {platform} device {jax.devices()[0]}")
    params_q, weights = QuadParams(), CostWeights()
    # moderate shapes: the XLA-vmap reference path compiles a 50-step scan
    # per sweep, which is expensive to build at H=50 — H=20 exercises the
    # same kernel code paths at a fraction of the compile time
    cfg = SolverConfig(horizon=20, max_iters=60, tol=1e-4, gtol=3e-4)
    B = 256

    key = jax.random.PRNGKey(7)
    scen = sample_scenarios(key, B).astype(jnp.float32)
    probs = jax.vmap(scenario_to_problem)(scen)
    ta = jnp.concatenate(
        [jnp.zeros((B, 1)), scen[:, 8:9] * 0.5, jnp.zeros((B, 1))], axis=1
    ).astype(jnp.float32)
    t = jnp.clip(jnp.linalg.norm(probs["x0"][:, 0:3], axis=1) / 4.0,
                 2.0, 4.0).astype(jnp.float32)
    args = (probs["x0"], jnp.zeros((B, 4), jnp.float32), probs["goal_pos"],
            jnp.zeros((B, 3), jnp.float32), ta, t)

    interp = platform != "tpu"  # CPU fallback exercises interpret mode
    if interp:
        from learningagileflight_se3_tpu.solver.ilqr_batched import (
            make_batched_mpc_solver_pallas,
        )
        psolve = jax.jit(make_batched_mpc_solver_pallas(
            params_q, weights, cfg, interpret=True))
    else:
        psolve = jax.jit(make_batched_mpc_solver(
            params_q, weights, cfg, backend="pallas"))
    xsolve = jax.jit(make_batched_mpc_solver(
        params_q, weights, cfg, backend="xla"))

    ps = psolve(*args)
    xs = xsolve(*args)
    both = np.asarray(ps.converged) & np.asarray(xs.converged)
    Jp, Jx = np.asarray(ps.cost), np.asarray(xs.cost)
    cost_rel = np.abs(Jp - Jx) / np.maximum(np.abs(Jx), 1.0)
    mae = np.abs(np.asarray(ps.control_traj)
                 - np.asarray(xs.control_traj)).mean(axis=(1, 2))
    both_frac = float(both.mean())
    med_rel = float(np.median(cost_rel[both]))
    med_mae = float(np.median(mae[both]))
    same_basin = float((cost_rel[both] < 1e-4).mean())

    # ---- tail breakdown (VERDICT r3 weak #4): every worst lane must be a
    # BASIN FLIP (the two solvers landed in different local minima of a
    # nonconvex problem: controls differ by O(0.01+) N) or involve a
    # non-converged side — never a kernel numeric error, whose signature
    # would be nearly-identical controls with a diverging cost.
    same_basin_q90 = float(np.percentile(cost_rel[both], 90))
    tail = cost_rel > 1e-4
    n_tail = int(tail.sum())
    flip = tail & (mae > 1e-2)
    nonconv = tail & ~both
    unexplained = tail & ~(mae > 1e-2) & both
    worst = int(np.argmax(cost_rel))
    log(f"tail (cost_rel>1e-4): {n_tail} lanes; basin flips {int(flip.sum())}, "
        f"not-both-converged {int(nonconv.sum())}, unexplained "
        f"{int(unexplained.sum())}")
    log(f"worst lane {worst}: cost_rel {cost_rel[worst]:.2e} mae "
        f"{mae[worst]:.3e} converged p/x "
        f"{bool(np.asarray(ps.converged)[worst])}/"
        f"{bool(np.asarray(xs.converged)[worst])}")

    ok = (both_frac >= 0.5 and med_rel < 1e-5 and med_mae < 1e-4
          and same_basin >= 0.85
          and same_basin_q90 < 1e-4        # q90 gate on converged lanes
          and int(unexplained.sum()) == 0)  # tail fully explained
    out = {
        "metric": "pallas_vs_xla_agreement",
        "value": 1.0 if ok else 0.0,
        "unit": "bool",
        "compiled": not interp,
        "platform": platform,
        "batch": B,
        "horizon": cfg.horizon,
        "max_iters": cfg.max_iters,
        "both_converged_frac": both_frac,
        "median_cost_rel_diff_converged": med_rel,
        "q90_cost_rel_diff_converged": same_basin_q90,
        "median_control_mae_converged": med_mae,
        "frac_same_basin_converged": same_basin,
        "max_cost_rel_diff": float(cost_rel.max()),
        "tail_lanes_over_1e4": n_tail,
        "tail_basin_flips": int(flip.sum()),
        "tail_not_both_converged": int(nonconv.sum()),
        "tail_unexplained": int(unexplained.sum()),
        "worst_lane": {
            "cost_rel": float(cost_rel[worst]),
            "control_mae": float(mae[worst]),
            "pallas_converged": bool(np.asarray(ps.converged)[worst]),
            "xla_converged": bool(np.asarray(xs.converged)[worst]),
            "explanation": (
                "basin flip" if mae[worst] > 1e-2 else
                "non-converged side" if not both[worst] else "unexplained"
            ),
        },
    }
    print(json.dumps(out))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Dev: sweep the iteration budget at RUNTIME on one compiled executable.

For VERDICT r3 item 2 (recover >=1000x at the quality operating point):
measures throughput and quality-vs-golden for several max_iters values and
reports the line-search forward-kernel counts that dominate the iteration
cost.  Not part of the benchmark contract — bench.py stays the artifact.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main():
    from learningagileflight_se3_tpu.config import (
        CostWeights, QuadParams, SolverConfig,
    )
    from learningagileflight_se3_tpu.models.sampler import (
        sample_scenarios, scenario_to_problem,
    )
    from learningagileflight_se3_tpu.solver.ilqr import make_batched_mpc_solver

    print(f"device {jax.devices()[0]}", flush=True)
    params_q, weights = QuadParams(), CostWeights()
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = SolverConfig(horizon=50, max_iters=45, tol=1e-4, gtol=3e-4,
                       ls_adaptive=True, ls_max_trips=cap)
    print(f"ls_max_trips={cap}", flush=True)
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    def make_args(seed):
        k = jax.random.PRNGKey(seed)
        scen = sample_scenarios(k, batch).astype(jnp.float32)
        probs = jax.vmap(scenario_to_problem)(scen)
        t = jnp.clip(jnp.linalg.norm(probs["x0"][:, 0:3], axis=1) / 4.0,
                     2.0, 4.0).astype(jnp.float32)
        ta = jnp.concatenate(
            [jnp.zeros((batch, 1)), scen[:, 8:9] * 0.5, jnp.zeros((batch, 1))],
            axis=1).astype(jnp.float32)
        return (probs["x0"], jnp.zeros((batch, 4), jnp.float32),
                probs["goal_pos"], jnp.zeros((batch, 3), jnp.float32), ta, t)

    solve = jax.jit(make_batched_mpc_solver(params_q, weights, cfg),
                    static_argnames=())
    args = [make_args(100 + i) for i in range(3)]
    jax.block_until_ready(args)

    t0 = time.time()
    sol = solve(*args[0], max_iters=jnp.asarray(45, jnp.int32))
    np.asarray(sol.control_traj)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    # golden (150 iters) once per arg set — same executable
    Jg = {}
    for i, a in enumerate(args):
        sg = solve(*a, max_iters=jnp.asarray(150, jnp.int32))
        Jg[i] = np.asarray(sg.cost)
        print(f"golden[{i}]: iters mean {float(sg.iterations.mean()):.1f} "
              f"conv {float(np.asarray(sg.converged).mean()):.3f} "
              f"ls_evals {int(sg.ls_evals)}", flush=True)

    for mi in (45, 50, 55, 60, 65):
        mi_rt = jnp.asarray(mi, jnp.int32)
        times, quals = [], []
        for i, a in enumerate(args):
            t0 = time.time()
            sol = solve(*a, max_iters=mi_rt)
            np.asarray(sol.control_traj)
            times.append(time.time() - t0)
            Jb = np.asarray(sol.cost)
            ex = (Jb - Jg[i]) / np.maximum(np.abs(Jg[i]), 1e-6)
            quals.append(ex)
        ex = np.concatenate(quals)
        # pipelined estimate: enqueue all three, one sync at the end
        t0 = time.time()
        sols = [solve(*a, max_iters=mi_rt) for a in args for _ in range(2)]
        for s in sols:
            np.asarray(s.control_traj)
        pipe = 6 * batch / (time.time() - t0)
        print(json.dumps({
            "max_iters": mi,
            "sync_sps": round(batch / min(times), 1),
            "pipe_sps": round(pipe, 1),
            "ls_evals": int(sol.ls_evals),
            "mean_iters": round(float(sol.iterations.mean()), 1),
            "frac_lt_1pct": round(float((ex < 0.01).mean()), 4),
            "q90_excess": float(np.percentile(ex, 90)),
            "med_excess": float(np.median(ex)),
        }), flush=True)


if __name__ == "__main__":
    main()

"""DEV: decompose the 10 Hz replan tick latency (bench_realtime r4).

Measures, on the current accelerator:
  1. tsolver fixed-point trip counts + per-call latency at several states;
  2. warm-started MPC solve latency: xla-vmap tile-8 vs pallas tile-128,
     at several iteration budgets;
  3. the fused tick (tsolve + DNN2 + solve) for each solver variant.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.config import (
    CostWeights, GateMotionConfig, QuadParams, SolverConfig,
)
from learningagileflight_se3_tpu.geometry.gate import (
    gate_from_width, rotate_y, translate, window_inputs,
)
from learningagileflight_se3_tpu.models.mlp import make_dnn2
from learningagileflight_se3_tpu.models.sampler import sample_scenarios
from learningagileflight_se3_tpu.solver.ilqr import make_batched_mpc_solver
from learningagileflight_se3_tpu.utils.checkpoint import load_params


def timeit(f, n=20):
    f()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    print(f"device {jax.devices()[0]}", flush=True)
    params_q, weights = QuadParams(), CostWeights()
    model2 = make_dnn2()
    like = model2.init(jax.random.PRNGKey(0), jnp.zeros((1, 18)))
    p2 = load_params("artifacts/nn3_1", like=like)
    motion = GateMotionConfig()

    scen = np.asarray(sample_scenarios(jax.random.PRNGKey(2024), 8))[0]
    start, final = scen[0:3], scen[3:6]
    width, pitch0 = scen[7], scen[8]
    pts = rotate_y(gate_from_width(jnp.asarray(width)), pitch0)
    vel = jnp.asarray(motion.velocity)
    w = motion.omega_y

    # ---- 1. tsolver trips ----
    def predict_t(state, t1):
        p = rotate_y(translate(pts, vel * t1), w * t1)
        inp = window_inputs(p, state, jnp.asarray(final))
        return model2.apply(p2, inp)[6]

    @jax.jit
    def tsolve_count(state):
        centroid = jnp.mean(pts, axis=0)
        t1 = jnp.linalg.norm(centroid - state[0:3]) / 3.0
        t2 = predict_t(state, t1)

        def cond(c):
            t1, t2, it = c
            return (jnp.abs(t2 - t1) > 1e-3) & (it < 100)

        def body(c):
            t1, t2, it = c
            t1 = t1 + (t2 - t1) / 2.0
            return (t1, predict_t(state, t1), it + 1)

        t1, t2, it = jax.lax.while_loop(cond, body, (t1, t2, 0))
        return t1, it

    st0 = jnp.asarray(np.concatenate([start, np.zeros(3), [1, 0, 0, 0], np.zeros(3)]).astype(np.float32))
    for name, st in [("start", st0),
                     ("mid", st0.at[1].add(4.0).at[4].set(3.0))]:
        t_out, trips = tsolve_count(st)
        lat = timeit(lambda: jax.block_until_ready(tsolve_count(st)))
        print(f"tsolve[{name}]: t={float(t_out):.2f} trips={int(trips)} "
              f"lat={lat:.1f} ms", flush=True)

    # ---- 2. warm solve latency by backend/budget ----
    cfg = SolverConfig(horizon=50, max_iters=45, tol=1e-4, gtol=3e-4)
    inp = window_inputs(pts, st0, jnp.asarray(final))
    out = model2.apply(p2, inp)

    for tile, backend in [(8, "xla"), (128, "pallas"), (256, "pallas")]:
        solve = jax.jit(make_batched_mpc_solver(
            params_q, weights, cfg, backend=backend))
        rep = lambda a, B=tile: jnp.tile(a[None], (B,) + (1,) * a.ndim)
        args = (rep(inp[0:13]), rep(jnp.zeros(4)), rep(inp[13:16]),
                rep(out[0:3]), rep(out[3:6]), rep(out[6]))
        sol = solve(*args)
        np.asarray(sol.control_traj)
        print(f"[{backend} tile={tile}] cold iters={int(sol.iterations[0])}", flush=True)
        Uw = sol.control_traj
        Uw = jnp.concatenate([Uw[:, 1:], Uw[:, -1:]], axis=1)

        def warm():
            s = solve(*args, U_init=Uw)
            np.asarray(s.control_traj)
            return s
        s = warm()
        lat = timeit(warm, n=15)
        print(f"[{backend} tile={tile}] warm iters={int(s.iterations[0])} "
              f"lat={lat:.1f} ms", flush=True)

    # ---- 3. fused tick (tsolve + DNN2 + solve) ----
    from learningagileflight_se3_tpu.sim.tsolver import make_traversal_time_solver
    tsolve = make_traversal_time_solver(model2, tol=1e-3)
    for tile, backend in [(8, "xla"), (128, "pallas")]:
        solve = make_batched_mpc_solver(params_q, weights, cfg, backend=backend)

        @jax.jit
        def tick(state, u_prev, U_warm):
            t = tsolve(p2, state, jnp.asarray(final), pts, vel, w)
            pts_f = rotate_y(translate(pts, t * vel), t * w)
            inp = window_inputs(pts_f, state, jnp.asarray(final))
            o = model2.apply(p2, inp)
            rep = lambda a, B=tile: jnp.tile(a[None], (B,) + (1,) * a.ndim)
            sol = solve(rep(inp[0:13]), rep(u_prev), rep(inp[13:16]),
                        rep(o[0:3]), rep(o[3:6]), rep(o[6]),
                        U_init=rep(U_warm))
            return sol.control_traj[0], sol.iterations[0]

        U0 = jnp.full((50, 4), 1.22, jnp.float32)
        Uw, it = tick(st0, jnp.zeros(4), U0)
        Uw2 = jnp.concatenate([Uw[1:], Uw[-1:]], axis=0)

        def full_tick():
            U, i = tick(st0, jnp.zeros(4), Uw2)
            np.asarray(U)
        lat = timeit(full_tick, n=15)
        print(f"tick[{backend} tile={tile}]: lat={lat:.1f} ms "
              f"(warm iters={int(it)})", flush=True)


if __name__ == "__main__":
    main()

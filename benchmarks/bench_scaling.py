"""Scaling benchmark: weak-scaling efficiency of the batched MPC solver over
a scenario-sharded device mesh.

The BASELINE.md scaling metric: solves/s at 1 chip / 1 host / N hosts.  Every
MPC solve is independent, so scenario data-parallelism over the mesh is the
scaling axis (the TPU equivalent of the reference's 10-process fork,
deep_learning.py:66-72); XLA partitions the batched solve with zero
collectives in the hot path.

On a multi-device platform this measures true weak scaling on silicon.  On
the single-chip axon tunnel (or plain CPU) it instead measures SHARDING
PARITY on an 8-device virtual CPU mesh: the same total batch, unsharded on
one device vs sharded over 8 — virtual devices share physical cores, so
weak scaling is not measurable, but partitioning overhead is (a healthy
program scores ~1: the sharded computation costs no more than the unsharded
one).

Prints ONE JSON line:
  {"metric": "weak_scaling_efficiency" | "virtual_mesh_sharding_parity",
   "value": <fraction>, "unit": "fraction", "vs_baseline": <same>, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # must happen before the CPU client is created (tests/conftest.py notes)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
    from learningagileflight_se3_tpu.models.sampler import (
        sample_scenarios,
        scenario_to_problem,
    )
    from learningagileflight_se3_tpu.parallel.mesh import make_mesh
    from learningagileflight_se3_tpu.solver.ilqr import make_batched_mpc_solver

    # multi-device accelerator -> measure silicon; otherwise measure the
    # 8-device virtual CPU mesh (the backend is already initialized by the
    # image's sitecustomize, so select devices explicitly rather than via
    # jax_platforms)
    all_devices = jax.devices()
    if len(all_devices) < 2:
        all_devices = jax.devices("cpu")
    platform = all_devices[0].platform
    log(f"platform: {platform}  devices: {len(all_devices)}")

    params_q, weights = QuadParams(), CostWeights()
    virtual = platform == "cpu"
    if virtual:
        horizon, iters = 20, 8      # small problem: methodology check
        total_batch = 64
    else:
        horizon, iters = 50, 30
        total_batch = None          # weak scaling: 2048 per device
    cfg = SolverConfig(horizon=horizon, max_iters=iters, tol=1e-4, gtol=3e-4)

    counts = [n for n in (1, 2, 4, 8) if n <= len(all_devices)]
    sps = {}
    for n in counts:
        mesh = make_mesh(all_devices[:n])
        batch = total_batch if virtual else 2048 * n
        key = jax.random.PRNGKey(0)
        scen = sample_scenarios(key, batch).astype(jnp.float32)
        probs = jax.vmap(scenario_to_problem)(scen)
        sh = NamedSharding(mesh, P("scenario"))
        x0 = jax.device_put(probs["x0"], sh)
        goal = jax.device_put(probs["goal_pos"], sh)
        u_last = jax.device_put(jnp.zeros((batch, 4), jnp.float32), sh)
        tra_pos = jax.device_put(jnp.zeros((batch, 3), jnp.float32), sh)
        tra_ang = jax.device_put(
            jnp.concatenate(
                [jnp.zeros((batch, 1)), scen[:, 8:9] * 0.5, jnp.zeros((batch, 1))],
                axis=1,
            ).astype(jnp.float32),
            sh,
        )
        t = jax.device_put(
            jnp.clip(jnp.linalg.norm(probs["x0"][:, 0:3], axis=1) / 4.0, 2.0, 4.0
                     ).astype(jnp.float32),
            sh,
        )
        # data on the CPU virtual mesh must not route to the TPU-only
        # Pallas kernel (the "auto" backend checks the default backend only)
        solver_backend = "auto" if platform == "tpu" else "xla"
        solve = jax.jit(
            make_batched_mpc_solver(params_q, weights, cfg, backend=solver_backend)
        )
        sol = solve(x0, u_last, goal, tra_pos, tra_ang, t)
        np.asarray(sol.control_traj)  # fetch-sync: reliable barrier under axon
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sol = solve(x0, u_last, goal, tra_pos, tra_ang, t)
            np.asarray(sol.control_traj)
            times.append(time.perf_counter() - t0)
        sps[n] = batch / min(times)
        log(f"devices={n}  batch={batch}  {sps[n]:.1f} solves/s")

    n_max = counts[-1]
    if virtual:
        # same total batch everywhere: parity = sharded / unsharded speed
        eff = sps[n_max] / sps[1]
        metric = "virtual_mesh_sharding_parity"
    else:
        eff = sps[n_max] / (n_max * sps[1])
        metric = "weak_scaling_efficiency"
    out = {
        "metric": metric,
        "value": round(float(eff), 3),
        "unit": "fraction",
        "vs_baseline": round(float(eff), 3),
        "devices": n_max,
        "solves_per_sec": {str(k): round(v, 1) for k, v in sps.items()},
        "platform": platform,
        "virtual_mesh": virtual,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

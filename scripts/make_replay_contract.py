"""Generate artifacts/replay_contract.npz — the recorded-replay contract of
the external-controller adapter (VERDICT r3 missing #1).

Flies the committed DNN2 (artifacts/nn3_1) closed-loop in the validation
plant on CPU f64 and records, for every 10 Hz control tick, the EXACT
engine-side observation handed to ExternalSimController.compute_control and
the EXACT control wrench + traversal time it returned.  The contract test
(tests/test_pybullet_harness.py) replays the observations through a freshly
constructed controller and asserts the outputs match — pinning the adapter
pipeline (state reassembly, quaternion reorder, Euler-rate conversion,
tsolver, DNN2, window-frame MPC, mixer) that any PyBullet host would call.

Usage: python scripts/make_replay_contract.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from learningagileflight_se3_tpu.config import QuadParams, SolverConfig, Variant  # noqa: E402
from learningagileflight_se3_tpu.geometry.gate import gate_from_width, gate_move  # noqa: E402
from learningagileflight_se3_tpu.models.mlp import make_dnn2  # noqa: E402
from learningagileflight_se3_tpu.sim.external_controller import (  # noqa: E402
    ExternalSimController,
)
from learningagileflight_se3_tpu.sim.validation_env import (  # noqa: E402
    ValidationEnv,
    ValidationEnvConfig,
)
from learningagileflight_se3_tpu.sim.validation_sim import (  # noqa: E402
    ValidationSimConfig,
    sample_validation_scenario,
)
from learningagileflight_se3_tpu.utils.checkpoint import load_params  # noqa: E402

# The contract's solver budget is smaller than deployment: the contract
# pins the ADAPTER pipeline, not the deployed solve budget, and must replay
# in well under a minute on the CPU test runners.  MUST match
# tests/test_pybullet_harness.  The u_ub=2.4 and fixed_point_tol=1e-2 fork
# deltas stay (the PyBullet-variant adapter is the thing being pinned).
CONTRACT_SOLVER = dict(horizon=40, max_iters=18, u_ub=2.4)
SEED = 7
TICKS = 6
CTRL_EVERY = 10
SIM_FREQ = 100


def main():
    model2 = make_dnn2()
    like = model2.init(jax.random.PRNGKey(0), jnp.zeros((1, 18)))
    p2 = load_params("artifacts/nn3_1", like=like)

    cfg = ValidationSimConfig()
    rng = np.random.default_rng(SEED)
    scen = sample_validation_scenario(rng, cfg)
    # MAIN-variant world scale: the committed nn3_1 is trained on the main
    # sampler's geometry (start ~(.,-9,.), goal ~(.,6,.), width ~0.9;
    # quad_nn.py:18-48) — the pybullet-fork's 0.3-0.4 m gates at ~4 m range
    # are outside its training distribution and the recording degenerates
    # to saturated thrust.  The adapter under test is identical either way;
    # the scenario just has to keep the flight meaningful.
    scen["start_point"] = np.array([1.5, -8.0, 0.5])
    scen["final_point"] = np.array([0.0, 6.0, 0.0])
    scen["yaw"] = 0.05
    scen["gate_width"] = 0.9
    scen["gate_pitch"] = 0.4
    origin = np.asarray(cfg.gate_origin)
    dt = 1.0 / SIM_FREQ
    n_steps = TICKS * CTRL_EVERY

    pts0 = np.asarray(gate_from_width(
        scen["gate_width"], scen["gate_pitch"], cfg.half_gate_height))
    moves, V = gate_move(
        jnp.asarray(pts0), jax.random.PRNGKey(SEED),
        jnp.asarray(cfg.gate_v, dtype=pts0.dtype), float(cfg.gate_w),
        T=n_steps * dt, dt=dt, noise_std=0.1, noise_clip=0.2,
    )
    moves, V = np.asarray(moves), np.asarray(V)

    ctrl = ExternalSimController(
        model2, p2,
        final_point=scen["final_point"],
        gate_motion=lambda i: (moves[min(i, len(moves) - 1)],
                               V[min(i, len(moves) - 1)]),
        w_rot=float(cfg.gate_w),
        origin=origin,
        variant=Variant.PYBULLET,
        solver_cfg=SolverConfig(**CONTRACT_SOLVER),
        fixed_point_tol=cfg.fixed_point_tol,
    )
    env = ValidationEnv(
        params=QuadParams(),
        cfg=ValidationEnvConfig(sim_freq_hz=SIM_FREQ),
        gate_motion=lambda i: (moves[min(i, len(moves) - 1)] + origin,
                               V[min(i, len(moves) - 1)]),
    )
    obs = env.reset(scen["start_point"] + origin, (0.0, 0.0, scen["yaw"]))

    obs_rows, act_rows, t_rows, tick_steps = [], [], [], []
    action = np.zeros(4)
    for i in range(n_steps):
        if i % CTRL_EVERY == 0:
            obs_rows.append(np.asarray(obs, dtype=np.float64).copy())
            tick_steps.append(i)
            action, t_pred = ctrl.compute_control(
                step=i,
                cur_pos=obs[0:3], cur_quat_xyzw=obs[3:7],
                cur_vel=obs[10:13], cur_euler_rates=obs[13:16],
                cur_rpy=obs[7:10],
            )
            act_rows.append(np.asarray(action, dtype=np.float64).copy())
            t_rows.append(float(t_pred))
        obs = env.step(action)

    out = os.path.join("artifacts", "replay_contract.npz")
    np.savez(
        out,
        observations=np.asarray(obs_rows),
        actions=np.asarray(act_rows),
        tra_times=np.asarray(t_rows),
        tick_steps=np.asarray(tick_steps),
        gate_moves=moves,
        gate_vel=V,
        start_point=scen["start_point"],
        final_point=scen["final_point"],
        yaw=scen["yaw"],
        gate_width=scen["gate_width"],
        gate_pitch=scen["gate_pitch"],
        origin=origin,
        w_rot=float(cfg.gate_w),
        fixed_point_tol=cfg.fixed_point_tol,
        solver_horizon=CONTRACT_SOLVER["horizon"],
        solver_max_iters=CONTRACT_SOLVER["max_iters"],
        solver_u_ub=CONTRACT_SOLVER["u_ub"],
    )
    print(f"wrote {out}: {len(obs_rows)} ticks; "
          f"action[0]={act_rows[0]}, t={t_rows[0]:.3f}")


if __name__ == "__main__":
    main()

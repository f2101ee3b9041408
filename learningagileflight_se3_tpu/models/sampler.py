"""Scenario samplers (JAX PRNG) — the reference's numpy samplers
(quad_nn.py:18-57) re-built on jax.random so thousands of scenarios sample
on-device per training step instead of one per forked process.

9-dim DNN1 scenario vector (quad_nn.py:18-48):
  [0:3] initial position  ~ U(-5,5)^3 + (0,-9,0)
  [3:6] final position    ~ U(-2,2)^3 + (0, 6,0)
  [6]   initial yaw       ~ U(-hw, hw)          (hw=0.1 main / pi/6 pybullet)
  [7]   gate width        ~ clip(N(0.9,0.3), 0.5, 1.25)
  [8]   gate pitch        ~ width-coupled bimodal clipped normal (lines 35-45)

Pretrain label (t_output, quad_nn.py:51-57): zeros except
  t = clip(round(|init_pos|/4, 1), 2, 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.config import SamplerConfig
from learningagileflight_se3_tpu.core.rotations import axis_angle_to_quat
from learningagileflight_se3_tpu.geometry.gate import gate_from_width


def sample_scenario(key, cfg: SamplerConfig = SamplerConfig()):
    """One 9-dim scenario vector."""
    k = jax.random.split(key, 6)
    init_pos = jax.random.uniform(
        k[0], (3,), minval=-cfg.init_pos_halfwidth, maxval=cfg.init_pos_halfwidth
    ) + jnp.asarray(cfg.init_pos_offset)
    final_pos = jax.random.uniform(
        k[1], (3,), minval=-cfg.final_pos_halfwidth, maxval=cfg.final_pos_halfwidth
    ) + jnp.asarray(cfg.final_pos_offset)
    yaw = jax.random.uniform(k[2], (), minval=-cfg.yaw_halfwidth, maxval=cfg.yaw_halfwidth)
    width = jnp.clip(
        cfg.width_mean + cfg.width_std * jax.random.normal(k[3]),
        cfg.width_clip[0],
        cfg.width_clip[1],
    )
    # pitch distribution coupled to width (quad_nn.py:35-45)
    angle = jnp.clip(1.3 * (1.2 - width), 0.0, jnp.pi / 3)
    angle1 = (jnp.pi / 2 - angle) / 3.0
    judge = jax.random.normal(k[4])
    eps = jax.random.normal(k[5])
    pitch_pos = jnp.clip(angle + angle1 + (2 * angle1 / 3) * eps, angle, jnp.pi / 2)
    pitch_neg = jnp.clip(-angle - angle1 + (2 * angle1 / 3) * eps, -jnp.pi / 2, -angle)
    pitch = jnp.where(judge > 0, pitch_pos, pitch_neg)
    return jnp.concatenate(
        [init_pos, final_pos, yaw[None], width[None], pitch[None]]
    )


def sample_scenarios(key, batch: int, cfg: SamplerConfig = SamplerConfig()):
    return jax.vmap(lambda kk: sample_scenario(kk, cfg))(jax.random.split(key, batch))


def pretrain_label(scenario):
    """t_output (quad_nn.py:51-57). round-to-0.1 kept (non-differentiable is
    fine: it's a supervised label)."""
    t = jnp.clip(jnp.round(jnp.linalg.norm(scenario[0:3]) / 4.0 * 10.0) / 10.0, 2.0, 4.0)
    return jnp.concatenate([jnp.zeros(6, scenario.dtype), t[None]])


def scenario_to_problem(scenario, half_height: float = 1.0):
    """Expand a 9-dim scenario into MPC problem data, mirroring the per-worker
    setup of deep_learning.py:24-32:
      gate corners from width, pitched by scenario[8] (grad worker lines 25-27);
      initial state [pos, 0 vel, yaw quat about z, 0 omega] (quad_policy.py:16-30,
      ini_q = toQuaternion(yaw, [0,0,1]), deep_learning.py:29).
    Returns dict(x0, goal_pos, gate_pts)."""
    init_pos = scenario[0:3]
    goal = scenario[3:6]
    yaw = scenario[6]
    width = scenario[7]
    pitch = scenario[8]
    gate_pts = gate_from_width(width, pitch, half_height)
    q0 = axis_angle_to_quat(yaw, jnp.array([0.0, 0.0, 1.0], dtype=scenario.dtype))
    x0 = jnp.concatenate(
        [init_pos, jnp.zeros(3, scenario.dtype), q0, jnp.zeros(3, scenario.dtype)]
    )
    return {"x0": x0, "goal_pos": goal, "gate_pts": gate_pts}

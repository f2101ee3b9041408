"""Pallas TPU kernel: fused closed-loop rollout + stage-cost evaluation.

The solver's other sequential hot loop (besides the Riccati sweep) is the
line-search forward pass: 50 dependent steps of tiny per-scenario work —
feedback `u = u_ref + alpha k + K dz`, clipping, the full stage cost, and the
Euler dynamics step (ilqr_batched.forward).  As an XLA scan this costs one
fusion round-trip per step; here the whole rollout is ONE kernel with the
state carry (z, accumulated cost) in VMEM and the batch on the 128-lane axis.

Grid (batch_tiles, H), time innermost and FORWARD; per-step inputs
(Z_ref, U_ref, kk, KK, t_weights) stream HBM->VMEM; per-problem inputs
(alpha, goal, tra_pos, tra_quat) are re-fetched per step (tiny blocks).

Covers both solver uses:
  * closed-loop line-search rollout: pass the real (kk, KK, alpha);
  * open-loop rollout-with-cost (initialization): pass kk = KK = 0 and any
    Z_ref whose row 0 is z0 (the feedback term vanishes).

Cost/dynamics formulas mirror costs/gate_costs.py and dynamics/quadrotor.py
exactly (forward Euler, no quaternion renorm, reference mixer
quad_model.py:86-98); parity is enforced by tests/test_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig

NX, NU = 13, 4
NZ = NX + NU
LANES = 128


def _dcm_rows(q):
    """All 9 entries of C_B_I(q) over lanes; q (4,L) -> tuple of 9 (L,)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y),
        2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x),
        2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y),
    )


def _attitude_error(q, qg):
    """3 - <C(qg), C(q)>_F over lanes (gate_costs.attitude_error)."""
    a = _dcm_rows(q)
    b = _dcm_rows(qg)
    acc = a[0] * b[0]
    for i in range(1, 9):
        acc = acc + a[i] * b[i]
    return 3.0 - acc


def _make_kernel(H, params: QuadParams, weights: CostWeights, cfg: SolverConfig):
    dt = cfg.dt
    lb, ub = cfg.u_lb, cfg.u_ub
    m = params.mass
    Jd = (params.Jx, params.Jy, params.Jz)

    def kernel(
        Zr_ref, Ur_ref, kk_ref, KK_ref, tw_ref,
        alpha_ref, goal_ref, tp_ref, tq_ref,
        Zn_ref, Un_ref, cost_ref,
        z_s, c_s,
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            z_s[:, :] = Zr_ref[0]
            c_s[:, :] = jnp.zeros_like(c_s)

        z = z_s[:, :]              # (17,L)
        zr = Zr_ref[0]             # (17,L)
        ur = Ur_ref[0]             # (4,L)
        kf = kk_ref[0]             # (4,L)
        K = KK_ref[0]              # (4,17,L)
        wk = tw_ref[0]             # (1,L) -> use [0]
        alpha = alpha_ref[0]       # (L,)
        goal = goal_ref[:, :]      # (3,L)
        tp = tp_ref[:, :]          # (3,L)
        tq = tq_ref[:, :]          # (4,L)

        dz = z - zr
        u = ur + alpha[None, :] * kf
        for r in range(NZ):
            u = u + K[:, r, :] * dz[r][None, :]
        u = jnp.clip(u, lb, ub)

        # ---- stage cost at (z, u) --------------------------------------
        x = z[:NX]
        up = z[NX:]
        r_, v_, q_, om = x[0:3], x[3:6], x[6:10], x[10:13]
        c = weights.wrf * jnp.sum((r_ - goal) ** 2, axis=0)
        c = c + weights.wvf * jnp.sum(v_ * v_, axis=0)
        c = c + weights.wwf * jnp.sum(om * om, axis=0)
        if weights.wqf != 0.0:
            ident = jnp.stack(
                [jnp.ones_like(q_[0]), 0 * q_[0], 0 * q_[0], 0 * q_[0]]
            )
            c = c + weights.wqf * _attitude_error(q_, ident)
        att = _attitude_error(q_, tq)
        att_term = att * att if weights.squared_attitude else att
        tra = weights.wrt * jnp.sum((r_ - tp) ** 2, axis=0) + weights.wqt * att_term
        c = c + wk[0] * tra
        c = c + weights.wthrust * jnp.sum(u * u, axis=0)
        c = c + weights.w_du * jnp.sum((u - up) ** 2, axis=0)
        if cfg.w_bound_weight > 0.0:
            viol = jnp.maximum(jnp.abs(om) - cfg.w_bound, 0.0)
            c = c + cfg.w_bound_weight * jnp.sum(viol * viol, axis=0)
        c_s[0, :] = c_s[0, :] + c

        # ---- Euler dynamics step (dynamics/quadrotor.py) ----------------
        T = u[0] + u[1] + u[2] + u[3]
        w0, x0_, y0, z0 = q_[0], q_[1], q_[2], q_[3]
        Tm = T / m
        dvx = 2 * (x0_ * z0 + w0 * y0) * Tm
        dvy = 2 * (y0 * z0 - w0 * x0_) * Tm
        dvz = (1 - 2 * (x0_ * x0_ + y0 * y0)) * Tm - params.g
        ox, oy, oz = om[0], om[1], om[2]
        dq0 = 0.5 * (-ox * x0_ - oy * y0 - oz * z0)
        dq1 = 0.5 * (ox * w0 + oz * y0 - oy * z0)
        dq2 = 0.5 * (oy * w0 - oz * x0_ + ox * z0)
        dq3 = 0.5 * (oz * w0 + oy * x0_ - ox * y0)
        Mx = (-u[1] + u[3]) * (params.l / 2.0)
        My = (-u[0] + u[2]) * (params.l / 2.0)
        Mz = (u[0] - u[1] + u[2] - u[3]) * params.c
        # w x (J w)
        cx = oy * (Jd[2] * oz) - oz * (Jd[1] * oy)
        cy = oz * (Jd[0] * ox) - ox * (Jd[2] * oz)
        cz = ox * (Jd[1] * oy) - oy * (Jd[0] * ox)
        dwx = (Mx - cx) / Jd[0]
        dwy = (My - cy) / Jd[1]
        dwz = (Mz - cz) / Jd[2]
        xdot = jnp.stack(
            [v_[0], v_[1], v_[2], dvx, dvy, dvz, dq0, dq1, dq2, dq3, dwx, dwy, dwz]
        )
        zn = jnp.concatenate([x + dt * xdot, u], axis=0)

        # ---- terminal cost on the LAST state --------------------------
        @pl.when(j == H - 1)
        def _():
            xr, xv, xo = zn[0:3], zn[3:6], zn[10:13]
            cf = weights.wrf * jnp.sum((xr - goal) ** 2, axis=0)
            cf = cf + weights.wvf * jnp.sum(xv * xv, axis=0)
            cf = cf + weights.wwf * jnp.sum(xo * xo, axis=0)
            if weights.wqf != 0.0:
                qn = zn[6:10]
                ident = jnp.stack(
                    [jnp.ones_like(qn[0]), 0 * qn[0], 0 * qn[0], 0 * qn[0]]
                )
                cf = cf + weights.wqf * _attitude_error(qn, ident)
            c_s[0, :] = c_s[0, :] + cf

        z_s[:, :] = zn
        Zn_ref[0] = zn
        Un_ref[0] = u
        cost_ref[:, :] = c_s[:, :]

    return kernel


def rollout_forward_pallas(
    Z_ref, U_ref, kk, KK, t_w, alpha, goal, tra_pos, tra_quat,
    params: QuadParams, weights: CostWeights, cfg: SolverConfig,
    interpret: bool = False,
):
    """Fused closed-loop rollout.  Layout: time-major batch-last —
    Z_ref (H,17,B) states 0..H-1, U_ref/kk (H,4,B), KK (H,4,17,B), t_w (H,1,B),
    alpha (1,B), goal/tra_pos (3,B), tra_quat (4,B).  B % 128 == 0.

    Returns (Zn (H,17,B) states 1..H, Un (H,4,B), cost (B,))."""
    H = Z_ref.shape[0]
    Bt = Z_ref.shape[-1]
    assert Bt % LANES == 0, f"batch {Bt} must be a multiple of {LANES}"
    nb = Bt // LANES
    dtp = Z_ref.dtype

    kernel = _make_kernel(H, params, weights, cfg)
    grid = (nb, H)
    fwd = lambda i, j: (j, 0, i)
    fwd3 = lambda i, j: (j, 0, 0, i)
    per_prob2 = lambda i, j: (0, i)

    in_specs = [
        pl.BlockSpec((1, NZ, LANES), fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, LANES), fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, LANES), fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, NZ, LANES), fwd3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, LANES), fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), per_prob2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, LANES), per_prob2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, LANES), per_prob2, memory_space=pltpu.VMEM),
        pl.BlockSpec((4, LANES), per_prob2, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, NZ, LANES), fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, LANES), fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), per_prob2, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((H, NZ, Bt), dtp),
        jax.ShapeDtypeStruct((H, NU, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
    ]
    scratch_shapes = [
        pltpu.VMEM((NZ, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
    ]
    Zn, Un, cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(Z_ref, U_ref, kk, KK, t_w, alpha, goal, tra_pos, tra_quat)
    return Zn, Un, cost[0]

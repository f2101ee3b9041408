"""Natively-batched control-limited DDP/iLQR with the fused Pallas backward.

`make_mpc_solver` (ilqr.py) is a single-problem solver that vmaps cleanly,
but under vmap the hot backward sweep lowers to a 50-step XLA loop of tiny
(B,17,17) ops — per-op overhead dominates on TPU.  This module is the same
algorithm written *natively over the batch axis*: one `lax.while_loop` whose
body runs TWO Pallas kernels

  1. the fully-fused Riccati/boxQP backward (ops/riccati_fused.py): exact
     Jacobian blocks, closed-form cost quadratics (solver/analytic.py
     semantics), the projected-gradient adjoint, and the whole value
     recursion computed IN-KERNEL from the raw trajectory — batch on the
     128-wide lane dimension, value-function carry in VMEM across the
     sequential time grid;
  2. the fused closed-loop rollout + stage-cost line-search forward pass
     (ops/rollout_pallas.py), per-lane step lengths.

Semantics match ilqr.make_mpc_solver exactly (same stage cost, Tassa
regularization schedule, Newton-decrement + true-projected-gradient
termination, stall gate) — tests/test_pallas.py checks kernel-vs-scan
equality and tests/test_solver.py::TestBatchedPallasSolver checks
solver-level agreement.

Constraints: batch must be a multiple of 128 (the TPU lane count).  The
`make_batched_mpc_solver(..., backend="auto")` wrapper in ilqr.py falls back
to the vmap path otherwise (and on CPU, where the kernel would need
interpret mode).

Internal layout is time-major (H, B, ...) so every time sweep is a `lax.scan`
over the leading axis and the Pallas batch-last layout is one moveaxis away.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
from learningagileflight_se3_tpu.core.rotations import rodrigues_to_quat
from learningagileflight_se3_tpu.core.rotations import quat_to_dcm_w2b
from learningagileflight_se3_tpu.ops.riccati_fused import riccati_backward_fused
from learningagileflight_se3_tpu.ops.rollout_pallas import rollout_forward_pallas
from learningagileflight_se3_tpu.solver.analytic import (
    attitude_curvature,
    make_final_quadratics,
)
from learningagileflight_se3_tpu.solver.ilqr import MPCSolution

NX = 13
NU = 4
NZ = NX + NU
LANES = 128


def make_batched_mpc_solver_pallas(
    params: QuadParams,
    weights: CostWeights,
    cfg: SolverConfig,
    return_gains: bool = False,
    interpret: bool = False,
):
    """solve(x0[B,13], u_last[B,4], goal[B,3], tra_pos[B,3], tra_ang[B,3],
    t[B], U_init=None|[B,H,4]) -> MPCSolution with leading batch axis.

    B must be a multiple of 128.  `interpret=True` runs the kernel in Pallas
    interpret mode (CPU tests)."""
    H = cfg.horizon
    dt = cfg.dt
    lb = cfg.u_lb
    ub = cfg.u_ub
    # numpy, NOT jnp: this factory may run lazily inside a jit trace (the
    # backend="auto" wrapper builds it on first call) — a jnp constant
    # created there would be a tracer captured in the closure and leak into
    # later traces (UnexpectedTracerError on the second trace).
    alphas_f = 0.5 ** np.arange(cfg.line_search_steps)
    final_quadratics = make_final_quadratics(weights)

    def _fused_rollout(Z_ref, U_ref, kk, KK, t_w, alpha, goal, tra_pos, tra_quat):
        """One ops/rollout_pallas kernel call; (H,B,..) <-> (H,..,B) moves."""
        bl = lambda x: jnp.moveaxis(x, 1, -1)
        Zn, Un, cost = rollout_forward_pallas(
            bl(Z_ref), bl(U_ref), bl(kk), bl(KK), t_w[:, None, :],
            alpha[None, :], goal.T, tra_pos.T, tra_quat.T,
            params, weights, cfg, interpret=interpret,
        )
        return jnp.moveaxis(Zn, -1, 1), jnp.moveaxis(Un, -1, 1), cost

    def rollout_cost(z0, U, t_w, goal, tra_pos, tra_quat):
        """U (H,B,4) -> Z (H+1,B,17), J (B,): open-loop = fused rollout with
        zero gains (the feedback term vanishes)."""
        B = z0.shape[0]
        dtype = z0.dtype
        Z_ref = jnp.broadcast_to(z0[None], (H, B, NZ))
        kk0 = jnp.zeros((H, B, NU), dtype)
        KK0 = jnp.zeros((H, B, NU, NZ), dtype)
        Zs, _, c = _fused_rollout(
            Z_ref, U, kk0, KK0, t_w, jnp.zeros(B, dtype), goal, tra_pos, tra_quat
        )
        return jnp.concatenate([z0[None], Zs], axis=0), c

    def backward(Z, U, t_w, goal, tra_pos, Hatt, att0, reg):
        """All derivatives (Jacobian blocks + cost quadratics + the true
        projected-gradient adjoint) are computed INSIDE the fused Pallas
        sweep; only the terminal quadratics come from XLA (one tiny vmap)."""
        ZU = jnp.concatenate([Z[:-1], U], axis=-1)  # (H,B,21)
        phi_z, phi_zz = jax.vmap(final_quadratics)(Z[-1], goal)
        bl = lambda x: jnp.moveaxis(x, 1, -1)  # (H,B,...) -> (H,...,B)
        kk, KK, dV1, dV2, fail, pg_true = riccati_backward_fused(
            bl(ZU), t_w[:, None, :], goal.T, tra_pos.T, Hatt, att0,
            jnp.moveaxis(phi_z, 0, -1), jnp.moveaxis(phi_zz, 0, -1),
            reg[None, :],
            params, weights, cfg,
            boxqp_iters=cfg.boxqp_iters, use_ddp=cfg.use_ddp,
            interpret=interpret,
        )
        kk = jnp.moveaxis(kk, -1, 1)   # (H,B,4)
        KK = jnp.moveaxis(KK, -1, 1)   # (H,B,4,17)
        return kk, KK, dV1, dV2, fail, pg_true

    def forward(Z, U, kk, KK, t_w, goal, tra_pos, tra_quat, alpha):
        """Closed-loop rollout, per-lane step length alpha (B,) — one fused
        kernel (state carry and cost accumulator in VMEM)."""
        Zn, Un, c = _fused_rollout(Z[:-1], U, kk, KK, t_w, alpha, goal, tra_pos, tra_quat)
        return jnp.concatenate([Z[0][None], Zn], axis=0), Un, c

    def line_search(Z, U, J, kk, KK, t_w, goal, tra_pos, tra_quat, dV1, dV2,
                    ls0, deep, skip):
        """Per-lane first-acceptable-alpha backtracking (ilqr.line_search),
        each lane starting at its warm index `ls0` (cfg.ls_adaptive).
        `deep` (B,) bool: escalated lanes sweep the FULL ladder range at
        coarse stride instead of their warm window — same trip bill as the
        capped search (see ilqr.py).
        `skip` (B,) bool: finished lanes enter pre-accepted and bill ZERO
        lock-step trips (done lanes walking the ladder was most of the
        batch's forward-kernel cost once most lanes had terminated)."""
        n_alpha = cfg.line_search_steps
        stride = cfg.ls_max_trips
        n_deep = -(-n_alpha // stride)
        dtype = J.dtype
        tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)
        alphas = jnp.asarray(alphas_f, dtype)
        max_trips = jnp.where(deep, n_deep, cfg.ls_max_trips)

        def cond(st):
            accepted, i, _, _, _ = st
            return jnp.any(
                (~accepted)
                & (jnp.where(deep, i * stride, ls0 + i) < n_alpha)
                & (i < max_trips)
            )

        def body(st):
            accepted, i, Zb, Ub, Jb = st
            alpha = alphas[jnp.minimum(
                jnp.where(deep, i * stride, ls0 + i), n_alpha - 1)]  # (B,)
            Zn, Un, Jn = forward(Z, U, kk, KK, t_w, goal, tra_pos, tra_quat, alpha)
            expected = -(alpha * dV1 + alpha * alpha * dV2)
            ok = (
                (Jn < J)
                & (expected > 0)
                & ((J - Jn) / jnp.maximum(expected, tiny) > 0.1)
                & ~accepted
            )
            Zb = jnp.where(ok[None, :, None], Zn, Zb)
            Ub = jnp.where(ok[None, :, None], Un, Ub)
            Jb = jnp.where(ok, Jn, Jb)
            active = ((~accepted)
                      & (jnp.where(deep, i * stride, ls0 + i) < n_alpha)
                      & (i < max_trips))
            return (accepted | ok, i + active.astype(i.dtype), Zb, Ub, Jb)

        B = J.shape[0]
        st0 = (skip, jnp.zeros(B, jnp.int32), Z, U, J)
        accepted, i_fin, Zb, Ub, Jb = jax.lax.while_loop(cond, body, st0)
        acc_idx = jnp.where(
            accepted,
            jnp.minimum(jnp.where(deep, (i_fin - 1) * stride, ls0 + i_fin - 1),
                        n_alpha - 1),
            ls0,
        )
        # kernel trips executed this iteration (lock-step: one forward per
        # trip for the WHOLE batch) = the deepest per-lane backtrack depth
        return accepted, Zb, Ub, Jb, acc_idx, jnp.max(i_fin)

    def solve(x0, u_last, goal_pos, tra_pos, tra_ang, t,
              U_init: Optional[jnp.ndarray] = None,
              max_iters=None):
        """max_iters: optional RUNTIME iteration cap (defaults to
        cfg.max_iters).  Pass a jnp.int32 scalar to sweep budgets without
        recompiling — the while_loop condition is data-dependent anyway."""
        if max_iters is None:
            max_iters = cfg.max_iters
        max_iters = jnp.asarray(max_iters, jnp.int32)
        B = x0.shape[0]
        assert B % LANES == 0, f"pallas path needs batch % {LANES} == 0, got {B}"
        dtype = jnp.result_type(x0.dtype, jnp.float32)
        x0 = x0.astype(dtype)
        u_last = jnp.asarray(u_last, dtype)
        goal = jnp.asarray(goal_pos, dtype)
        tra_pos = jnp.asarray(tra_pos, dtype)
        if cfg.quantize_t:
            t = jnp.round(t * 10.0) / 10.0
        tra_quat = jax.vmap(rodrigues_to_quat)(jnp.asarray(tra_ang, dtype))
        # per-problem attitude curvature: constant across solver iterations
        Hatt = jnp.moveaxis(jax.vmap(attitude_curvature)(tra_quat), 0, -1)
        att0 = (
            3.0 - jnp.trace(jax.vmap(quat_to_dcm_w2b)(tra_quat), axis1=1, axis2=2)
        )[None, :]
        ks = jnp.arange(H, dtype=dtype)
        t_w = weights.tra_amp * jnp.exp(
            -weights.tra_decay * (dt * ks[:, None] - t[None, :].astype(dtype)) ** 2
        )  # (H,B)
        z0 = jnp.concatenate([x0, u_last], axis=-1)

        if U_init is None:
            U0 = jnp.full((H, B, NU), 0.5 * (lb + ub), dtype)
        else:
            U0 = jnp.moveaxis(U_init.astype(dtype), 0, 1)  # (B,H,4)->(H,B,4)

        Z, J0 = rollout_cost(z0, U0, t_w, goal, tra_pos, tra_quat)
        KK0 = jnp.zeros((H, B, NU, NZ), dtype)

        def cond(state):
            (Z, U, J, KK, reg, done, it, pg, ls_n, ls0, n_np, J_chk, w_it,
             st) = state
            return jnp.any((~done) & (it < max_iters))

        def body(state):
            (Z, U, J, KK, reg, done, it, _, ls_n, ls0, n_np, J_chk, w_it,
             st) = state
            kk, KK_new, dV1, dV2, fail, pg = backward(
                Z, U, t_w, goal, tra_pos, Hatt, att0, reg
            )

            decrement = -(dV1 + dV2)
            # `sane` guards every |J|-relative tolerance: at an exploded
            # rollout cost (1e69) the gates are trivially satisfied and a
            # garbage iterate would earn the status-1 KKT certificate the
            # certified tier trusts (same guard as ilqr.py)
            sane = jnp.isfinite(J) & (jnp.abs(J) < 1e12)
            grad_small = pg <= cfg.gtol * (jnp.abs(J) + 1.0)
            stationary = (
                (decrement <= cfg.tol * (jnp.abs(J) + 1.0))
                & (dV1 <= 0)
                & grad_small
                & ~fail
                & sane
            )

            active = ~done & (it < max_iters)
            # ladder escalation for live failure streaks (see ilqr.py);
            # finished lanes are skipped outright; no-op under a full ladder
            if cfg.ls_max_trips < cfg.line_search_steps:
                deep = ((n_np >= 2)
                        & (decrement > cfg.tol * (jnp.abs(J) + 1.0))
                        & active)
            else:
                deep = active & False
            accepted, Z_ls, U_ls, J_ls, acc_idx, ls_trips = line_search(
                Z, U, J, kk, KK_new, t_w, goal, tra_pos, tra_quat, dV1, dV2,
                ls0, deep, ~active,
            )
            improved = accepted & ~fail & ~stationary & active

            Z_n = jnp.where(improved[None, :, None], Z_ls, Z)
            U_n = jnp.where(improved[None, :, None], U_ls, U)
            KK_n = jnp.where(
                (improved | (stationary & active))[None, :, None, None], KK_new, KK
            )
            J_n = jnp.where(improved, J_ls, J)

            reg_n = jnp.where(
                active,
                jnp.where(
                    improved,
                    jnp.maximum(reg * cfg.reg_shrink, cfg.reg_min),
                    jnp.minimum(reg * cfg.reg_grow, cfg.reg_max * 2.0),
                ),
                reg,
            )
            grad_smallish = pg <= cfg.stall_gtol * (jnp.abs(J) + 1.0)
            stalled = (
                ~improved
                & ~stationary
                & (decrement <= cfg.tol * (jnp.abs(J) + 1.0))
                & (reg >= 64.0)
                & grad_smallish
                & sane
            )
            # progress-window floor (see ilqr.py for the full rationale):
            # terminate when an entire W-iteration window made < tol
            # cumulative progress — the only cut that proved quality-safe
            np_n = jnp.where(active, jnp.where(improved, 0, n_np + 1), n_np)
            w_n = w_it + active.astype(w_it.dtype)
            window_full = (cfg.no_progress_iters > 0) & (
                w_n >= cfg.no_progress_iters
            )
            window_progress = (J_chk - J_n) > cfg.tol * (jnp.abs(J_n) + 1.0)
            floor_exit = window_full & ~window_progress & sane
            J_chk_n = jnp.where(window_full & active, J_n, J_chk)
            w_n = jnp.where(window_full & active, 0, w_n)
            blowout = ~improved & ~stationary & (reg > cfg.reg_max)
            done_n = done | (
                active & (stationary | stalled | floor_exit | blowout)
            )
            # exit taxonomy (MPCSolution.status codes); each reason below
            # implies done_n, so writing under `active` is exact
            st_n = st
            st_n = jnp.where(active & stationary, 1, st_n)
            st_n = jnp.where(active & ~stationary & stalled, 2, st_n)
            st_n = jnp.where(
                active & ~stationary & ~stalled & floor_exit, 3, st_n)
            st_n = jnp.where(
                active & ~stationary & ~stalled & ~floor_exit & blowout,
                4, st_n)
            it_n = it + active.astype(it.dtype)
            if cfg.ls_adaptive:
                ls0_n = jnp.where(improved & active,
                                  jnp.maximum(acc_idx - 1, 0), ls0)
            else:
                ls0_n = ls0
            return (Z_n, U_n, J_n, KK_n, reg_n, done_n, it_n, pg,
                    ls_n + ls_trips, ls0_n, np_n, J_chk_n, w_n, st_n)

        reg0 = jnp.full((B,), cfg.reg_init, dtype)
        pg0 = jnp.full((B,), jnp.inf, dtype)
        done0 = jnp.zeros((B,), bool)
        it0 = jnp.zeros((B,), jnp.int32)
        state0 = (Z, U0, J0, KK0, reg0, done0, it0, pg0,
                  jnp.zeros((), jnp.int32), jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B,), jnp.int32), J0, jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B,), jnp.int32))
        (Zf, Uf, Jf, KKf, regf, donef, itf, pgf, ls_f, _, _, _, _, stf) = (
            jax.lax.while_loop(cond, body, state0)
        )

        return MPCSolution(
            state_traj=jnp.moveaxis(Zf[:, :, :NX], 0, 1),   # (B,H+1,13)
            control_traj=jnp.moveaxis(Uf, 0, 1),            # (B,H,4)
            cost=Jf,
            iterations=itf,
            converged=donef & jnp.isfinite(Jf) & (jnp.abs(Jf) < 1e12),
            gains_K=jnp.moveaxis(KKf, 0, 1) if return_gains
            else jnp.zeros((0,), dtype),
            grad_norm=pgf,
            reg_final=regf,
            ls_evals=ls_f,
            status=stf,
        )

    return solve

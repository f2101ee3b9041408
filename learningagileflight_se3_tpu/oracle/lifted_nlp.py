"""Lifted multiple-shooting NLP oracle (test-only, CPU float64).

This mirrors the reference's *formulation* exactly (quad_OC.py:115-174): the
decision vector interleaves states and controls
``w = [X0, U0, X1, U1, ..., U_{H-1}, X_H]`` with the dynamics as H*13
equality constraints ``X_{k+1} - X_k - dt f(X_k, U_k) = 0``, the initial
state pinned by bounds (quad_OC.py:127-129), per-rotor thrust bounds on U and
the omega box on X (quad_policy.py:46-51), solved by a constrained
interior/SQP method (scipy trust-constr — the same algorithm family as the
reference's IPOPT) from the reference's *cold* initialization: controls at
the midpoint of their bounds, states at the midpoint of theirs (= 0 for the
±1e20-bounded coordinates) (quad_OC.py:142,158).

It shares NO formulation with solver/ilqr.py (which eliminates the equality
constraints by shooting) and NO warm start — so agreement between the two is
a genuine independent-basin check, unlike oracle/shooting.py which optimizes
the very same shooting objective.

All first/second derivatives are exact (jax) and assembled into the NLP's
block-sparse structures (the role MUMPS plays under IPOPT, SURVEY.md §2.10):
the constraint Jacobian is block-banded [A_k, B_k, -I], the Lagrangian
Hessian block-diagonal over stage triples (x_k, u_k, u_{k-1}).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from scipy.optimize import NonlinearConstraint, minimize

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
from learningagileflight_se3_tpu.core.rotations import rodrigues_to_quat
from learningagileflight_se3_tpu.costs.gate_costs import final_cost, stage_cost
from learningagileflight_se3_tpu.dynamics.quadrotor import euler_step

NX = 13
NU = 4


class LiftedSolution(NamedTuple):
    state_traj: np.ndarray    # (H+1, 13)
    control_traj: np.ndarray  # (H, 4)
    cost: float
    constr_violation: float   # max |dynamics defect| at the solution
    kkt_residual: float       # max |projected Lagrangian gradient|
    result: object            # scipy OptimizeResult


def _split(w, H):
    """w (n,) -> X (H+1, NX), U (H, NU) for the interleaved layout."""
    blocks = w[: H * (NX + NU)].reshape(H, NX + NU)
    X = jnp.concatenate([blocks[:, :NX], w[None, H * (NX + NU):]], axis=0)
    U = blocks[:, NX:]
    return X, U


def solve_lifted_oracle(
    params: QuadParams,
    weights: CostWeights,
    cfg: SolverConfig,
    x0,
    u_last,
    goal_pos,
    tra_pos,
    tra_ang,
    t,
    maxiter: int = 2000,
    state_bound: float = np.inf,
    init: str = "rollout",
    polish: bool = True,
    polish_iters: int = 60,
    polish_tol: float = 1e-9,
) -> LiftedSolution:
    """Cold-start lifted-NLP solve. Requires jax x64 (tests enable it).

    init='zeros' replicates the reference's w0 exactly (states at the ±1e20
    bound midpoint = 0, quad_OC.py:158) — IPOPT starts fine from there but
    scipy's trust-constr wanders; init='rollout' (default) seeds the states
    with the FEASIBLE rollout of the midpoint controls instead.  Both inits
    are derived purely from problem data (never from the solver under test),
    so the comparison stays cold/independent either way."""
    H, dt = cfg.horizon, cfg.dt
    if cfg.quantize_t:
        t = round(float(t) * 10.0) / 10.0
    f64 = jnp.float64
    tra_quat = rodrigues_to_quat(jnp.asarray(tra_ang, f64))
    x0 = np.asarray(x0, np.float64)
    u_last = jnp.asarray(u_last, f64)
    goal_pos = jnp.asarray(goal_pos, f64)
    tra_pos = jnp.asarray(tra_pos, f64)
    n = (H + 1) * NX + H * NU
    m = H * NX
    S = NX + NU  # interleaved block stride

    ks = jnp.arange(H, dtype=f64)

    def objective(w):
        X, U = _split(w, H)
        Uprev = jnp.concatenate([u_last[None], U[:-1]], axis=0)

        def one(k, x, u, up):
            return stage_cost(x, u, up, k, dt, t, goal_pos, tra_pos, tra_quat, weights)

        return jnp.sum(jax.vmap(one)(ks, X[:-1], U, Uprev)) + final_cost(
            X[H], goal_pos, weights
        )

    def defects(w):
        X, U = _split(w, H)
        Xnext = jax.vmap(lambda x, u: euler_step(x, u, dt, params))(X[:-1], U)
        return (Xnext - X[1:]).ravel()  # (m,)

    obj_vg = jax.jit(jax.value_and_grad(objective))
    con_fn = jax.jit(defects)

    # ---- sparse constraint Jacobian: rows k -> [A_k | B_k | -I] blocks ----
    dyn_jac = jax.jit(
        jax.vmap(
            lambda x, u: jax.jacfwd(
                lambda xu: euler_step(xu[:NX], xu[NX:], dt, params)
            )(jnp.concatenate([x, u]))
        )
    )  # (H, NX, NX+NU)

    # static index pattern (row, col) for [A_k B_k] blocks and the -I blocks
    rows_ab = np.repeat(np.arange(m).reshape(H, NX), S, axis=1).ravel()
    cols_ab = (
        np.arange(H)[:, None, None] * S + np.arange(S)[None, None, :]
    ).repeat(NX, axis=1).ravel()
    rows_eye = np.arange(m)
    cols_eye = (np.arange(H)[:, None] * S + S + np.arange(NX)[None, :]).ravel()

    def con_jac(w):
        X, U = _split(jnp.asarray(w, f64), H)
        AB = np.asarray(dyn_jac(X[:-1], U))  # (H, NX, S)
        data = np.concatenate([AB.ravel(), -np.ones(m)])
        rows = np.concatenate([rows_ab, rows_eye])
        cols = np.concatenate([cols_ab, cols_eye])
        return sp.csr_matrix((data, (rows, cols)), shape=(m, n))

    # ---- sparse Hessians ----
    # stage-cost Hessian over the triple (x_k, u_k, u_{k-1}): 21x21 blocks.
    def stage_cost_triple(k, xuup):
        return stage_cost(
            xuup[:NX], xuup[NX:NX + NU], xuup[NX + NU:], k, dt, t,
            goal_pos, tra_pos, tra_quat, weights,
        )

    stage_hess = jax.jit(
        jax.vmap(lambda k, xuup: jax.hessian(stage_cost_triple, argnums=1)(k, xuup))
    )  # (H, 21, 21)
    final_hess = jax.jit(jax.hessian(lambda xH: final_cost(xH, goal_pos, weights)))

    # index map: triple slot -> global w index; u_{-1} = u_last is constant,
    # so stage 0's u_prev rows/cols are DROPPED from the assembly.
    def triple_indices(k):
        xk = np.arange(k * S, k * S + NX)
        uk = np.arange(k * S + NX, k * S + S)
        if k == 0:
            up = np.full(NU, -1)  # constant u_last: not a decision variable
        else:
            up = np.arange((k - 1) * S + NX, (k - 1) * S + S)
        return np.concatenate([xk, uk, up])

    tri_idx = np.stack([triple_indices(k) for k in range(H)])  # (H, 21)
    xH_idx = np.arange(H * S, H * S + NX)

    def assemble_block_hess(blocks, final_block=None):
        """blocks (H, 21, 21) on triple indices (+ optional final 13x13)."""
        rows_list, cols_list, data_list = [], [], []
        for k in range(H):
            idx = tri_idx[k]
            valid = idx >= 0
            ii = idx[valid]
            b = blocks[k][np.ix_(valid, valid)]
            rows_list.append(np.repeat(ii, ii.size))
            cols_list.append(np.tile(ii, ii.size))
            data_list.append(b.ravel())
        if final_block is not None:
            rows_list.append(np.repeat(xH_idx, NX))
            cols_list.append(np.tile(xH_idx, NX))
            data_list.append(final_block.ravel())
        return sp.csr_matrix(
            (np.concatenate(data_list),
             (np.concatenate(rows_list), np.concatenate(cols_list))),
            shape=(n, n),
        )

    def obj_hess(w):
        X, U = _split(jnp.asarray(w, f64), H)
        Uprev = jnp.concatenate([u_last[None], U[:-1]], axis=0)
        XUUP = jnp.concatenate([X[:-1], U, Uprev], axis=1)  # (H, 21)
        blocks = np.asarray(stage_hess(ks, XUUP))
        return assemble_block_hess(blocks, np.asarray(final_hess(X[H])))

    # constraint-Lagrangian Hessian: sum_k hess_{(x_k,u_k)} v_k . f(x_k,u_k)
    def vdot_step(xu, v):
        return jnp.dot(v, euler_step(xu[:NX], xu[NX:], dt, params))

    vf_hess = jax.jit(jax.vmap(jax.hessian(vdot_step)))  # (H, 17, 17)

    def con_hess(w, v):
        X, U = _split(jnp.asarray(w, f64), H)
        XU = jnp.concatenate([X[:-1], U], axis=1)
        V = jnp.asarray(v, f64).reshape(H, NX)
        blocks = np.asarray(vf_hess(XU, V))  # (H, S, S)
        big = np.zeros((H, S + NU, S + NU))  # embed (x,u) block in triple
        big[:, :S, :S] = blocks
        return assemble_block_hess(big)

    # bounds: X0 pinned; omega box; thrust box (quad_policy.py:46-51)
    x_lb = np.full(NX, -state_bound)
    x_ub = np.full(NX, state_bound)
    x_lb[10:13] = -cfg.w_bound
    x_ub[10:13] = cfg.w_bound
    u_lb = np.full(NU, cfg.u_lb)
    u_ub = np.full(NU, cfg.u_ub)
    lb = np.concatenate([x0] + [np.concatenate([u_lb, x_lb])] * H)
    ub = np.concatenate([x0] + [np.concatenate([u_ub, x_ub])] * H)

    # the reference's cold w0: X0 = ini_state, controls/states at bound
    # midpoints (quad_OC.py:128,142,158) — the reference's ±1e20 state bounds
    # midpoint to 0; we pass ±inf to trust-constr (so it drops the barrier
    # terms the reference's IPOPT handles natively) and keep the 0 init
    finite = np.isfinite(x_lb) & np.isfinite(x_ub)
    x_mid = np.zeros(NX)
    x_mid[finite] = 0.5 * (x_lb[finite] + x_ub[finite])
    u_mid = 0.5 * (u_lb + u_ub)
    if init == "zeros":
        w0 = np.concatenate([x0] + [np.concatenate([u_mid, x_mid])] * H)
    elif init == "rollout":
        from learningagileflight_se3_tpu.dynamics.quadrotor import rollout

        Xr = np.array(
            rollout(jnp.asarray(x0, f64), jnp.tile(jnp.asarray(u_mid, f64), (H, 1)),
                    dt, params)
        )
        Xr[:, 10:13] = np.clip(Xr[:, 10:13], x_lb[10:13], x_ub[10:13])
        w0 = np.concatenate(
            [x0] + [np.concatenate([u_mid, Xr[k + 1]]) for k in range(H)]
        )
    else:
        raise ValueError(init)

    def fun(w):
        v, g = obj_vg(jnp.asarray(w, f64))
        return float(v), np.asarray(g)

    nlc = NonlinearConstraint(
        lambda w: np.asarray(con_fn(jnp.asarray(w, f64))),
        0.0,
        0.0,
        jac=con_jac,
        hess=con_hess,
    )
    res = minimize(
        fun,
        w0,
        jac=True,
        hess=obj_hess,
        method="trust-constr",
        bounds=list(zip(lb, ub)),
        constraints=[nlc],
        options={"maxiter": maxiter, "gtol": 1e-10, "xtol": 1e-14},
    )
    Xs, Us = _split(jnp.asarray(res.x, f64), H)
    return LiftedSolution(
        state_traj=np.asarray(Xs),
        control_traj=np.asarray(Us),
        cost=float(res.fun),
        constr_violation=float(
            np.max(np.abs(np.asarray(con_fn(jnp.asarray(res.x, f64)))))
        ),
        result=res,
    )

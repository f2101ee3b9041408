"""Pallas TPU kernel: FULLY-fused Riccati backward sweep.

ops/riccati_pallas.py consumes precomputed derivative tensors (A, B, cost
quadratics) streamed from HBM — ~390 KB per (step, batch-tile), produced by a
separate XLA stage each solver iteration.  This kernel computes everything
from the raw trajectory instead: per step it reads only ZU (21 floats/lane)
plus tiny per-problem data, and rebuilds

  * the exact dynamics Jacobian BLOCKS (solver/analytic.explicit_jacobians —
    the augmented-state A is block-sparse:
        rows r:  [I  dt*I   0     0    0]
        rows v:  [0   I    Sd     0    0]      Sd = dt*(sum u/m) * D(q)
        rows q:  [0   0    Qq    Gm    0]      Qq = I + dt/2*Omega(om)
        rows om: [0   0     0    Wm    0]      Gm = dt/2*G(q)
        rows up: [0   0     0     0    0]      Wm = I - dt*J^-1 W(om)
    and B has a rank-1 v-block (dt/m)*c(q) x 1^T, a CONSTANT om-block
    dt*J^-1*mixer, and an identity u_prev-block);
  * the closed-form cost quadratics (solver/analytic.make_cost_quadratics),
    from the per-problem attitude curvature Hatt (constant 4x4 per problem,
    passed in) and the Gaussian time weights.

All Riccati contractions exploit the block sparsity: Qzz = lzz + A^T Vzz A
is built column-block by column-block (~1.8k FMA/step/lane vs ~9.8k dense),
likewise Quz, Quu, and the Tassa regularization terms B^T B / B^T A.  The
boxQP / Cholesky / gain / value-function updates are shared with
ops/riccati_pallas.py.

Semantics are IDENTICAL to the unfused pipeline (XLA derivatives +
riccati_backward_pallas); tests/test_pallas.py::TestFusedRiccatiKernel checks
element-for-element agreement against that path in interpret mode.

Layouts (time-major, batch-last):
  ZU (H,21,B)  t_w (H,1,B)  goal/tra_pos (3,B)  Hatt (4,4,B)  att0 (1,B)
  phi_z (17,B)  phi_zz (17,17,B)  reg (1,B)
Outputs: kk (H,4,B), KK (H,4,17,B), dV1/dV2/fail/pg (B,).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
from learningagileflight_se3_tpu.ops.riccati_pallas import (
    _boxqp_lanes,
    _chol4,
    _chol4_solve,
    _h2_lanes,
    _masked4,
    _mm_m_m,
    _mm_m_v,
    _mm_tT_m,
    _mm_tT_v,
)

NX, NU = 13, 4
NZ = NX + NU
NZU = NZ + NU
LANES = 128

# Hatt for the identity goal quaternion: att(q) = 4(x^2+y^2+z^2)
# (= hess of 3 - tr(R(q)); see analytic.attitude_curvature)
_HG_DIAG = (0.0, 8.0, 8.0, 8.0)


def _diag_lanes(vals):
    """vals: list of n (L,) entries -> diagonal (n,n,L)."""
    n = len(vals)
    z = jnp.zeros_like(vals[0])
    return jnp.stack(
        [jnp.stack([vals[i] if j == i else z for j in range(n)]) for i in range(n)]
    )


def _jac_blocks(ZUk, params: QuadParams, dt):
    """Nonzero Jacobian blocks at one step over lanes (explicit_jacobians).

    Returns (Sd (3,4,L), Qq (4,4,L), Gm (4,3,L), Wm (3,3,L), bv (3,L));
    the constant blocks (dt*I in A; mixer and identity in B) are applied
    structurally by the callers."""
    q = ZUk[6:10]
    om = ZUk[10:13]
    u = ZUk[NZ:]
    w0, x0, y0, z0 = q[0], q[1], q[2], q[3]
    ox, oy, oz = om[0], om[1], om[2]
    one = jnp.ones_like(w0)
    zer = jnp.zeros_like(w0)
    m = params.mass
    Jx, Jy, Jz = params.Jx, params.Jy, params.Jz
    hdt = 0.5 * dt

    s = dt * (u[0] + u[1] + u[2] + u[3]) / m
    Sd = jnp.stack(
        [
            jnp.stack([2 * y0, 2 * z0, 2 * w0, 2 * x0]),
            jnp.stack([-2 * x0, -2 * w0, 2 * z0, 2 * y0]),
            jnp.stack([zer, -4 * x0, -4 * y0, zer]),
        ]
    ) * s[None, None, :]

    Qq = jnp.stack(
        [
            jnp.stack([one, -hdt * ox, -hdt * oy, -hdt * oz]),
            jnp.stack([hdt * ox, one, hdt * oz, -hdt * oy]),
            jnp.stack([hdt * oy, -hdt * oz, one, hdt * ox]),
            jnp.stack([hdt * oz, hdt * oy, -hdt * ox, one]),
        ]
    )

    Gm = hdt * jnp.stack(
        [
            jnp.stack([-x0, -y0, -z0]),
            jnp.stack([w0, -z0, y0]),
            jnp.stack([z0, w0, -x0]),
            jnp.stack([-y0, x0, w0]),
        ]
    )

    # W = [om]x diag(J) - [J om]x   (rows pre-divided by J)
    Wm = jnp.stack(
        [
            jnp.stack([one, -dt * (Jz - Jy) * oz / Jx, -dt * (Jz - Jy) * oy / Jx]),
            jnp.stack([-dt * (Jx - Jz) * oz / Jy, one, -dt * (Jx - Jz) * ox / Jy]),
            jnp.stack([-dt * (Jy - Jx) * oy / Jz, -dt * (Jy - Jx) * ox / Jz, one]),
        ]
    )

    bv = (dt / m) * jnp.stack(
        [
            2 * (x0 * z0 + w0 * y0),
            2 * (y0 * z0 - w0 * x0),
            1 - 2 * (x0 * x0 + y0 * y0),
        ]
    )
    return Sd, Qq, Gm, Wm, bv


def _mixj(params: QuadParams, dt) -> np.ndarray:
    """Constant om-block of B: dt * J^-1 @ mixer, (3,4) host floats."""
    l2 = params.l / 2.0
    c = params.c
    mix = np.array([[0.0, -l2, 0.0, l2], [-l2, 0.0, l2, 0.0], [c, -c, c, -c]])
    J = np.array([params.Jx, params.Jy, params.Jz])
    return dt * mix / J[:, None]


def _At_v(vec, Sd, Qq, Gm, Wm, dt):
    """A^T @ vec over lanes via the block structure; vec (17,L) -> (17,L)."""
    vr, vv, vq, vo = vec[0:3], vec[3:6], vec[6:10], vec[10:13]
    return jnp.concatenate(
        [
            vr,
            dt * vr + vv,
            _mm_tT_v(Sd, vv) + _mm_tT_v(Qq, vq),
            _mm_tT_v(Gm, vq) + _mm_tT_v(Wm, vo),
            jnp.zeros_like(vec[13:17]),
        ],
        axis=0,
    )


def _Bt_v(vec, bv, mixj):
    """B^T @ vec over lanes; vec (17,L) -> (4,L)."""
    vv, vo, vu = vec[3:6], vec[10:13], vec[13:17]
    shared = bv[0] * vv[0] + bv[1] * vv[1] + bv[2] * vv[2]
    return jnp.stack(
        [
            shared + sum(mixj[t][j] * vo[t] for t in range(3)) + vu[j]
            for j in range(4)
        ]
    )


def _cost_quadratics_lanes(ZUk, wk, goal, tp, Hatt, att0, weights, cfg):
    """Closed-form stage-cost quadratics at one step over lanes
    (analytic.make_cost_quadratics).  Returns (lz (17,L), lu (4,L),
    lzz_blocks, luz/luu are handled structurally by the caller).

    lzz_blocks = (d_r (L,), d_v const, lqq (4,4,L), d_om (3,L), d_up const):
    the only dense block is the 4x4 attitude curvature."""
    r = ZUk[0:3]
    v = ZUk[3:6]
    q = ZUk[6:10]
    om = ZUk[10:13]
    up = ZUk[13:17]
    u = ZUk[NZ:]

    ctp = 2.0 * weights.wrt * wk  # (L,)
    lz_r = ctp[None, :] * (r - tp) + (2.0 * weights.wrf) * (r - goal)
    d_r = ctp + 2.0 * weights.wrf

    lz_v = (2.0 * weights.wvf) * v

    Hq = _mm_m_v(Hatt, q)  # (4,L)
    att = att0[0] + 0.5 * (q[0] * Hq[0] + q[1] * Hq[1] + q[2] * Hq[2] + q[3] * Hq[3])
    wq = weights.wqt * wk  # (L,)
    if weights.squared_attitude:
        lz_q = (2.0 * wq * att)[None, :] * Hq
        lqq = (2.0 * wq)[None, None, :] * (
            Hq[:, None, :] * Hq[None, :, :] + att[None, None, :] * Hatt
        )
    else:
        lz_q = wq[None, :] * Hq
        lqq = wq[None, None, :] * Hatt
    if weights.wqf != 0.0:
        hg = _HG_DIAG
        lz_q = lz_q + weights.wqf * jnp.stack([hg[i] * q[i] for i in range(4)])
        lqq = lqq + _diag_lanes(
            [jnp.full_like(att, weights.wqf * hg[i]) for i in range(4)]
        )

    lz_om = (2.0 * weights.wwf) * om
    d_om = jnp.broadcast_to(
        jnp.full_like(att, 2.0 * weights.wwf)[None, :], (3, att.shape[0])
    )
    if cfg.w_bound_weight > 0.0:
        viol = jnp.maximum(jnp.abs(om) - cfg.w_bound, 0.0)
        lz_om = lz_om + (2.0 * cfg.w_bound_weight) * viol * jnp.sign(om)
        d_om = d_om + (2.0 * cfg.w_bound_weight) * (viol > 0).astype(att.dtype)

    du = u - up
    lz_up = (-2.0 * weights.w_du) * du
    lu = (2.0 * weights.wthrust) * u + (2.0 * weights.w_du) * du

    lz = jnp.concatenate([lz_r, lz_v, lz_q, lz_om, lz_up], axis=0)
    return lz, lu, (d_r, lqq, d_om)


# -------------------------------------------------------------------- kernel
def _make_kernel(H, params: QuadParams, weights: CostWeights,
                 cfg: SolverConfig, boxqp_iters, use_ddp):
    dt = cfg.dt
    lb, ub = cfg.u_lb, cfg.u_ub
    mixj = _mixj(params, dt).tolist()
    # constant pieces of B^T B and luu/luz
    mm = (np.asarray(mixj) .T @ np.asarray(mixj)).tolist()  # (4,4)
    c_luu = 2.0 * (weights.wthrust + weights.w_du)
    c_luz = -2.0 * weights.w_du

    def kernel(
        ZU_ref, tw_ref, goal_ref, tp_ref, Hatt_ref, att0_ref,
        phiz_ref, phizz_ref, reg_ref,
        kk_ref, KK_ref, dV1_ref, dV2_ref, fail_ref, pg_ref,
        Vz_s, Vzz_s, dv1_s, dv2_s, fail_s, lam_s, pg_s,
    ):
        j = pl.program_id(1)
        dtp = ZU_ref.dtype

        @pl.when(j == 0)
        def _():
            Vz_s[:, :] = phiz_ref[:, :]
            Vzz_s[:, :, :] = phizz_ref[:, :, :]
            dv1_s[:, :] = jnp.zeros_like(dv1_s)
            dv2_s[:, :] = jnp.zeros_like(dv2_s)
            fail_s[:, :] = jnp.zeros_like(fail_s)
            lam_s[:, :] = phiz_ref[:, :]
            pg_s[:, :] = jnp.zeros_like(pg_s)

        ZUk = ZU_ref[0]          # (21,L)
        wk = tw_ref[0][0]        # (L,)
        goal = goal_ref[:, :]    # (3,L)
        tp = tp_ref[:, :]        # (3,L)
        Hatt = Hatt_ref[:, :, :]  # (4,4,L)
        att0 = att0_ref[:, :]    # (1,L)
        reg = reg_ref[0]         # (L,)
        Uk = ZUk[NZ:]            # (4,L)
        L = Uk.shape[-1]
        Vz = Vz_s[:, :]
        Vzz = Vzz_s[:, :, :]

        # ---- in-kernel derivatives ------------------------------------
        Sd, Qq, Gm, Wm, bv = _jac_blocks(ZUk, params, dt)
        lz, lu, (d_r, lqq, d_om) = _cost_quadratics_lanes(
            ZUk, wk, goal, tp, Hatt, att0, weights, cfg
        )

        # ---- fused adjoint / true projected gradient -------------------
        lam = lam_s[:, :]
        gu = lu + _Bt_v(lam, bv, mixj)
        eps_b = 1e-7 * (ub - lb)
        at_lo_g = (Uk <= lb + eps_b) & (gu > 0)
        at_hi_g = (Uk >= ub - eps_b) & (gu < 0)
        free_g = 1.0 - (at_lo_g | at_hi_g).astype(dtp)
        agu = jnp.abs(gu) * free_g
        pg_s[0, :] = jnp.maximum(
            pg_s[0, :],
            jnp.maximum(jnp.maximum(agu[0], agu[1]), jnp.maximum(agu[2], agu[3])),
        )
        lam_s[:, :] = lz + _At_v(lam, Sd, Qq, Gm, Wm, dt)

        # ---- Q expansions via block-sparse products --------------------
        Qz = lz + _At_v(Vz, Sd, Qq, Gm, Wm, dt)
        Qu = lu + _Bt_v(Vz, bv, mixj)

        # M = Vzz @ A, column blocks (17, 3/3/4/3/4, L)
        Vr = Vzz[:, 0:3, :]
        Vv = Vzz[:, 3:6, :]
        Vq = Vzz[:, 6:10, :]
        Vo = Vzz[:, 10:13, :]
        M = jnp.concatenate(
            [
                Vr,
                dt * Vr + Vv,
                _mm_m_m(Vv, Sd) + _mm_m_m(Vq, Qq),
                _mm_m_m(Vq, Gm) + _mm_m_m(Vo, Wm),
                jnp.zeros((NZ, NU, L), dtp),
            ],
            axis=1,
        )  # (17,17,L)

        # Qzz = lzz + A^T M, row blocks; lzz folded in per block
        top = M[0:3]
        z_ = lambda r, c: jnp.zeros((r, c, L), dtp)
        row_r = top + jnp.concatenate([_diag_lanes([d_r, d_r, d_r]), z_(3, 14)], axis=1)
        dv = jnp.full((L,), 2.0 * weights.wvf, dtp)
        row_v = (dt * top + M[3:6]) + jnp.concatenate(
            [z_(3, 3), _diag_lanes([dv, dv, dv]), z_(3, 11)], axis=1
        )
        row_q = (_mm_tT_m(Sd, M[3:6]) + _mm_tT_m(Qq, M[6:10])) + jnp.concatenate(
            [z_(4, 6), lqq, z_(4, 7)], axis=1
        )
        row_o = (_mm_tT_m(Gm, M[6:10]) + _mm_tT_m(Wm, M[10:13])) + jnp.concatenate(
            [z_(3, 10), _diag_lanes([d_om[0], d_om[1], d_om[2]]), z_(3, 4)], axis=1
        )
        dup = jnp.full((L,), 2.0 * weights.w_du, dtp)
        row_u = jnp.concatenate(
            [z_(4, 13), _diag_lanes([dup, dup, dup, dup])], axis=1
        )
        Qzz = jnp.concatenate([row_r, row_v, row_q, row_o, row_u], axis=0)

        # BtV = B^T Vzz (4,17,L): rank-1 v part shared across rows
        shared = bv[0] * Vzz[3] + bv[1] * Vzz[4] + bv[2] * Vzz[5]  # (17,L)
        BtV = jnp.stack(
            [
                shared
                + sum(mixj[t][jj] * Vzz[10 + t] for t in range(3))
                + Vzz[13 + jj]
                for jj in range(4)
            ]
        )

        # Quz = luz + BtV @ A, column blocks; luz only hits the u_prev block
        luz_up = _diag_lanes([jnp.full((L,), c_luz, dtp)] * 4)
        Quz = jnp.concatenate(
            [
                BtV[:, 0:3, :],
                dt * BtV[:, 0:3, :] + BtV[:, 3:6, :],
                _mm_m_m(BtV[:, 3:6, :], Sd) + _mm_m_m(BtV[:, 6:10, :], Qq),
                _mm_m_m(BtV[:, 6:10, :], Gm) + _mm_m_m(BtV[:, 10:13, :], Wm),
                luz_up,
            ],
            axis=1,
        )

        # Quu = luu + BtV @ B
        colshared = (
            BtV[:, 3, :] * bv[0] + BtV[:, 4, :] * bv[1] + BtV[:, 5, :] * bv[2]
        )  # (4,L)
        Quu = jnp.stack(
            [
                colshared
                + sum(mixj[t][jj] * BtV[:, 10 + t, :] for t in range(3))
                + BtV[:, 13 + jj, :]
                for jj in range(4)
            ],
            axis=1,
        )  # (4,4,L)
        Quu = Quu + _diag_lanes([jnp.full((L,), c_luu, dtp)] * 4)

        if use_ddp:
            Hqq, hqu, P, Sww = _h2_lanes(ZUk, Vz, params)
            rows_q = jnp.concatenate([z_(4, 6), dt * Hqq, dt * P, z_(4, 4)], axis=1)
            rows_w = jnp.concatenate(
                [z_(3, 6), dt * jnp.swapaxes(P, 0, 1), -dt * Sww, z_(3, 4)], axis=1
            )
            Qzz = Qzz + jnp.concatenate([z_(6, NZ), rows_q, rows_w, z_(4, NZ)], axis=0)
            hq4 = jnp.stack([hqu, hqu, hqu, hqu])
            Quz = Quz + jnp.concatenate([z_(4, 6), dt * hq4, z_(4, 7)], axis=1)

        # ---- Tassa regularization via block-sparse B^T B / B^T A --------
        bb = bv[0] * bv[0] + bv[1] * bv[1] + bv[2] * bv[2]  # (L,)
        eye4 = np.eye(4).tolist()
        BtB = jnp.stack(
            [
                jnp.stack(
                    [bb + (mm[i][jj] + eye4[i][jj]) for jj in range(4)]
                )
                for i in range(4)
            ]
        )  # (4,4,L)
        bvSd = _mm_tT_v(Sd, bv)  # (4,L)
        mjW = jnp.stack(
            [
                jnp.stack([sum(mixj[t][jj] * Wm[t, c_] for t in range(3)) for c_ in range(3)])
                for jj in range(4)
            ]
        )  # (4,3,L)
        BtA = jnp.concatenate(
            [
                z_(4, 3),
                jnp.stack([bv, bv, bv, bv]),
                jnp.stack([bvSd, bvSd, bvSd, bvSd]),
                mjW,
                z_(4, 4),
            ],
            axis=1,
        )  # (4,17,L)
        Quu_r = Quu + reg[None, None, :] * BtB
        Quz_r = Quz + reg[None, None, :] * BtA
        Quu_r = 0.5 * (Quu_r + jnp.swapaxes(Quu_r, 0, 1))

        # ---- boxQP feedforward, masked-Newton gains (shared helpers) ----
        lo = lb - Uk
        hi = ub - Uk
        kf, free = _boxqp_lanes(Quu_r, Qu, lo, hi, boxqp_iters)
        L4, ok = _chol4(_masked4(Quu_r, free))
        K = -_chol4_solve(L4, Quz_r * free[:, None, :]) * free[:, None, :]
        fail_s[0, :] = jnp.maximum(fail_s[0, :], (~ok).astype(dtp))

        Quu_kf = _mm_m_v(Quu, kf)
        Vz_n = Qz + _mm_tT_v(K, Quu_kf) + _mm_tT_v(K, Qu) + _mm_tT_v(Quz, kf)
        KtQuu = _mm_tT_m(K, Quu)
        KtQuz = _mm_tT_m(K, Quz)
        Vzz_n = Qzz + _mm_m_m(KtQuu, K) + KtQuz + jnp.swapaxes(KtQuz, 0, 1)
        Vzz_n = 0.5 * (Vzz_n + jnp.swapaxes(Vzz_n, 0, 1))

        dv1_s[0, :] = dv1_s[0, :] + jnp.sum(kf * Qu, axis=0)
        dv2_s[0, :] = dv2_s[0, :] + 0.5 * jnp.sum(kf * Quu_kf, axis=0)

        Vz_s[:, :] = Vz_n
        Vzz_s[:, :, :] = Vzz_n
        kk_ref[0] = kf
        KK_ref[0] = K
        dV1_ref[:, :] = dv1_s[:, :]
        dV2_ref[:, :] = dv2_s[:, :]
        fail_ref[:, :] = fail_s[:, :]
        pg_ref[:, :] = pg_s[:, :]

    return kernel


def riccati_backward_fused(
    ZU, t_w, goal, tra_pos, Hatt, att0, phi_z, phi_zz, reg,
    params: QuadParams, weights: CostWeights, cfg: SolverConfig,
    boxqp_iters: int = 6, use_ddp: bool = True, interpret: bool = False,
):
    """Fully-fused batched backward sweep from the raw trajectory.

    ZU (H,21,B) time-major batch-last; t_w (H,1,B); goal/tra_pos (3,B);
    Hatt (4,4,B) per-problem attitude curvature (analytic.attitude_curvature);
    att0 (1,B) its constant offset; phi_z (17,B); phi_zz (17,17,B); reg (1,B).
    B must be a multiple of 128.

    Returns (kk (H,4,B), KK (H,4,17,B), dV1, dV2, fail, pg) — identical
    semantics to ops/riccati_pallas.riccati_backward_pallas fed with
    solver/analytic.py derivatives."""
    H, _, Bt = ZU.shape
    assert Bt % LANES == 0, f"batch {Bt} must be a multiple of {LANES}"
    nb = Bt // LANES
    dtp = ZU.dtype

    kernel = _make_kernel(H, params, weights, cfg, boxqp_iters, use_ddp)
    grid = (nb, H)
    rev = lambda i, j: (H - 1 - j, 0, i)
    pp2 = lambda i, j: (0, i)
    pp3 = lambda i, j: (0, 0, i)

    in_specs = [
        pl.BlockSpec((1, NZU, LANES), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, LANES), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, LANES), pp2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, LANES), pp2, memory_space=pltpu.VMEM),
        pl.BlockSpec((4, 4, LANES), pp3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), pp2, memory_space=pltpu.VMEM),
        pl.BlockSpec((NZ, LANES), pp2, memory_space=pltpu.VMEM),
        pl.BlockSpec((NZ, NZ, LANES), pp3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), pp2, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, NU, LANES), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NU, NZ, LANES), lambda i, j: (H - 1 - j, 0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), pp2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), pp2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), pp2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), pp2, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((H, NU, Bt), dtp),
        jax.ShapeDtypeStruct((H, NU, NZ, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
        jax.ShapeDtypeStruct((1, Bt), dtp),
    ]
    scratch_shapes = [
        pltpu.VMEM((NZ, LANES), dtp),
        pltpu.VMEM((NZ, NZ, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
        pltpu.VMEM((NZ, LANES), dtp),
        pltpu.VMEM((1, LANES), dtp),
    ]

    kk, KK, dV1, dV2, fail, pg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(ZU, t_w, goal, tra_pos, Hatt, att0, phi_z, phi_zz, reg)
    return kk, KK, dV1[0], dV2[0], fail[0] > 0, pg[0]

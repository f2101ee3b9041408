"""Closed-form derivative engine for the MPC solver — the TPU fast path.

Key observation: the augmented-state dynamics are an exact CUBIC polynomial
in (z, u) (quaternion kinematics and gyroscopic terms are bilinear, the
thrust acceleration (sum u / m) * c(q) is trilinear), and the stage cost is
quartic with one 4x4 constant-curvature core (the attitude error
tr(I - Rt^T R(q)) is an inhomogeneous QUADRATIC form in the unnormalized
quaternion).  Therefore:

  * the dynamics Jacobian F(zu) = F0 + H.zu + 1/2 T.zu.zu  is EXACT with
    constant tensors F0 (17,21), Hf (17,21,21), Tf (17,21,21,21), computed
    once by nested jacfwd at zero;
  * the Hessian of the Hamiltonian term lam.f is  einsum(lam, Hf) +
    einsum(lam, Tf, zu)  — one batched contraction instead of a per-step
    jax.hessian inside the backward scan;
  * cost gradients/Hessians are closed-form from the constant attitude
    curvature Hatt = hess_q tr(I - Rt^T R(q)) (4x4, per problem) plus
    diagonal position/velocity/rate/thrust terms.

This removes ALL per-timestep autodiff from the solver: each iLQR/Newton
iteration becomes a handful of large batched einsums (MXU) + one light
Riccati scan, which is what shrinks the reference's 9-IPOPT-solves-per-sample
hot loop (deep_learning.py; quad_OC.py:170-174) to TPU speeds.

Everything is validated against jax.jacfwd/jax.hessian ground truth in
tests/test_analytic.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
from learningagileflight_se3_tpu.core.rotations import quat_to_dcm_w2b
from learningagileflight_se3_tpu.dynamics.quadrotor import euler_step

NX, NU = 13, 4
NZ = NX + NU
NZU = NZ + NU


def _aug_f(zu, dt, params):
    x, u = zu[:NX], zu[NZ:]
    return jnp.concatenate([euler_step(x, u, dt, params), u])


def dynamics_tensors(params: QuadParams, dt: float):
    """Constant Taylor tensors of the cubic augmented dynamics at 0:
    (F0 (17,21), Hf (17,21,21), Tf (17,21,21,21)) as numpy float64.

    f(zu) = f0 + F0.zu + 1/2 zu^T Hf zu + 1/6 Tf.zu.zu.zu (exact)."""
    f = lambda zu: _aug_f(zu, dt, params)
    # ensure_compile_time_eval: solver builders may be invoked inside a jit
    # trace; these constants must be evaluated eagerly regardless.
    with jax.ensure_compile_time_eval():
        z0 = jnp.zeros(NZU)  # default dtype; coefficients are small products
        f0 = np.asarray(f(z0), np.float64)
        F0 = np.asarray(jax.jacfwd(f)(z0), np.float64)
        Hf = np.asarray(jax.jacfwd(jax.jacfwd(f))(z0), np.float64)
        Tf = np.asarray(jax.jacfwd(jax.jacfwd(jax.jacfwd(f)))(z0), np.float64)
    return f0, F0, Hf, Tf


def attitude_curvature(tra_quat):
    """Hatt = hess_q tr(I - Rt^T R(q)) — constant 4x4 (att is quadratic in q).

    Derivation: each entry of dir_cosine(q) (quad_model.py:637-643) is an
    inhomogeneous quadratic in q, so att(q) = att(0) + 1/2 q^T Hatt q with
    zero linear term.  Closed form via the S-matrices of R_ij."""
    # att(q) = 3 - sum_ij Rt_ij R_ij(q).  Build Hatt = -sum_ij Rt_ij * hess(R_ij).
    # hess(R_ij) are constant 4x4s; assemble them once symbolically.
    Rt = quat_to_dcm_w2b(tra_quat)

    dtype = tra_quat.dtype
    E = jnp.zeros((3, 3, 4, 4), dtype)
    # R(q) entries (w,x,y,z ordering), from quad_model.py:637-643:
    # R00 = 1-2(y^2+z^2)        -> hess diag(0,0,-4,-4)
    # R01 = 2(xy+wz)            -> hess: d2/dxdy=2, d2/dwdz=2 (sym)
    # R02 = 2(xz-wy)            -> d2/dxdz=2, d2/dwdy=-2
    # R10 = 2(xy-wz)            -> d2/dxdy=2, d2/dwdz=-2
    # R11 = 1-2(x^2+z^2)        -> diag(0,-4,0,-4)
    # R12 = 2(yz+wx)            -> d2/dydz=2, d2/dwdx=2
    # R20 = 2(xz+wy)            -> d2/dxdz=2, d2/dwdy=2
    # R21 = 2(yz-wx)            -> d2/dydz=2, d2/dwdx=-2
    # R22 = 1-2(x^2+y^2)        -> diag(0,-4,-4,0)
    def sym(i, j, v):
        m = jnp.zeros((4, 4), dtype)
        m = m.at[i, j].add(v).at[j, i].add(v)
        return m

    def diag(*vals):
        return jnp.diag(jnp.asarray(vals, dtype))

    E = E.at[0, 0].set(diag(0, 0, -4, -4))
    E = E.at[0, 1].set(sym(1, 2, 2) + sym(0, 3, 2))
    E = E.at[0, 2].set(sym(1, 3, 2) + sym(0, 2, -2))
    E = E.at[1, 0].set(sym(1, 2, 2) + sym(0, 3, -2))
    E = E.at[1, 1].set(diag(0, -4, 0, -4))
    E = E.at[1, 2].set(sym(2, 3, 2) + sym(0, 1, 2))
    E = E.at[2, 0].set(sym(1, 3, 2) + sym(0, 2, 2))
    E = E.at[2, 1].set(sym(2, 3, 2) + sym(0, 1, -2))
    E = E.at[2, 2].set(diag(0, -4, -4, 0))

    return -jnp.einsum("ij,ijab->ab", Rt, E)


def make_cost_quadratics(weights: CostWeights, cfg: SolverConfig):
    """Build quadratics(Z, U, t_weights, goal_pos, tra_pos, tra_quat) ->
    (lz, lu, lzz, luz, luu) closed-form, batched over the horizon."""

    def quadratics(Z, U, t_weights, goal_pos, tra_pos, tra_quat):
        dtype = Z.dtype
        H = Z.shape[0]
        I3 = jnp.eye(3, dtype=dtype)
        I4 = jnp.eye(4, dtype=dtype)
        r, v, q, om, up = (
            Z[:, 0:3], Z[:, 3:6], Z[:, 6:10], Z[:, 10:13], Z[:, 13:17]
        )
        wk = t_weights

        Hatt = attitude_curvature(tra_quat).astype(dtype)
        att0 = 3.0 - jnp.trace(quat_to_dcm_w2b(tra_quat))
        Hq = q @ Hatt  # (H,4), Hatt symmetric
        att = att0 + 0.5 * jnp.sum(q * Hq, axis=1)  # (H,)

        lz = jnp.zeros((H, NZ), dtype)
        lzz = jnp.zeros((H, NZ, NZ), dtype)

        # traversal + goal position
        ctp = (2.0 * weights.wrt) * wk
        lz = lz.at[:, 0:3].set(
            ctp[:, None] * (r - tra_pos[None, :])
            + 2.0 * weights.wrf * (r - goal_pos[None, :])
        )
        lzz = lzz.at[:, 0:3, 0:3].set(
            (ctp + 2.0 * weights.wrf)[:, None, None] * I3[None]
        )
        # velocity / omega
        lz = lz.at[:, 3:6].set(2.0 * weights.wvf * v)
        lzz = lzz.at[:, 3:6, 3:6].set(2.0 * weights.wvf * I3[None])
        om_lz = 2.0 * weights.wwf * om
        om_lzz = 2.0 * weights.wwf * jnp.ones((H, 3), dtype)
        if cfg.w_bound_weight > 0.0:
            viol = jnp.maximum(jnp.abs(om) - cfg.w_bound, 0.0)
            om_lz = om_lz + 2.0 * cfg.w_bound_weight * viol * jnp.sign(om)
            om_lzz = om_lzz + 2.0 * cfg.w_bound_weight * (viol > 0)
        lz = lz.at[:, 10:13].set(om_lz)
        lzz = lzz.at[:, 10:13, 10:13].set(om_lzz[..., None] * I3[None])

        # attitude term
        wq = weights.wqt * wk
        if weights.squared_attitude:
            # d(att^2) = 2 att Hq ; d2 = 2 Hq Hq^T + 2 att Hatt
            lz = lz.at[:, 6:10].set((2.0 * wq * att)[:, None] * Hq)
            lzz = lzz.at[:, 6:10, 6:10].set(
                2.0 * wq[:, None, None]
                * (Hq[:, :, None] * Hq[:, None, :] + att[:, None, None] * Hatt[None])
            )
        else:
            lz = lz.at[:, 6:10].set(wq[:, None] * Hq)
            lzz = lzz.at[:, 6:10, 6:10].set(wq[:, None, None] * Hatt[None])

        # goal attitude (wqf) — rarely used (0 in training, quad_policy.py:38)
        if weights.wqf != 0.0:
            gq = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)
            Hg = attitude_curvature(gq).astype(dtype)
            Hgq = q @ Hg
            lz = lz.at[:, 6:10].add(weights.wqf * Hgq)
            lzz = lzz.at[:, 6:10, 6:10].add(weights.wqf * Hg[None])

        # control-rate coupling: w_du |u - u_prev|^2
        du = U - up
        lz = lz.at[:, 13:17].set(-2.0 * weights.w_du * du)
        lzz = lzz.at[:, 13:17, 13:17].set(2.0 * weights.w_du * I4[None])

        lu = 2.0 * weights.wthrust * U + 2.0 * weights.w_du * du
        luu = jnp.broadcast_to(
            2.0 * (weights.wthrust + weights.w_du) * I4, (H, NU, NU)
        )
        luz = jnp.zeros((H, NU, NZ), dtype)
        luz = luz.at[:, :, 13:17].set(
            jnp.broadcast_to(-2.0 * weights.w_du * I4, (H, NU, NU))
        )

        return lz, lu, lzz, luz, luu

    return quadratics


def make_final_quadratics(weights: CostWeights):
    """Closed-form (phi_z, phi_zz) of the terminal goal cost."""

    def final_quadratics(zH, goal_pos):
        dtype = zH.dtype
        I3 = jnp.eye(3, dtype=dtype)
        phi_z = jnp.zeros(NZ, dtype)
        phi_zz = jnp.zeros((NZ, NZ), dtype)
        phi_z = phi_z.at[0:3].set(2.0 * weights.wrf * (zH[0:3] - goal_pos))
        phi_zz = phi_zz.at[0:3, 0:3].set(2.0 * weights.wrf * I3)
        phi_z = phi_z.at[3:6].set(2.0 * weights.wvf * zH[3:6])
        phi_zz = phi_zz.at[3:6, 3:6].set(2.0 * weights.wvf * I3)
        phi_z = phi_z.at[10:13].set(2.0 * weights.wwf * zH[10:13])
        phi_zz = phi_zz.at[10:13, 10:13].set(2.0 * weights.wwf * I3)
        if weights.wqf != 0.0:
            gq = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)
            Hg = attitude_curvature(gq).astype(dtype)
            phi_z = phi_z.at[6:10].set(weights.wqf * (Hg @ zH[6:10]))
            phi_zz = phi_zz.at[6:10, 6:10].set(weights.wqf * Hg)
        # phi_zz is state-independent (constant curvature); tie it to zH so
        # its manual axes match the rest of the Riccati carry under shard_map
        phi_zz = phi_zz + zH[0] * 0.0
        return phi_z, phi_zz

    return final_quadratics


class DynamicsTaylor:
    """Holds the constant Taylor tensors (as host numpy, cast per call so one
    instance serves f32 TPU and f64 oracle paths) and evaluates exact
    Jacobians and Hamiltonian Hessians as batched contractions."""

    def __init__(self, params: QuadParams, dt: float):
        f0, F0, Hf, Tf = dynamics_tensors(params, dt)
        self._f0, self._F0, self._Hf, self._Tf = f0, F0, Hf, Tf

    def tensors(self, dtype):
        return (
            jnp.asarray(self._F0, dtype),
            jnp.asarray(self._Hf, dtype),
            jnp.asarray(self._Tf, dtype),
        )

    def hf_flat(self, dtype):
        """(17, 441) view of Hf for in-scan Vz contractions."""
        return jnp.asarray(self._Hf.reshape(NZ, NZU * NZU), dtype)

    def tf_flat(self, dtype):
        """(17, 9261) view of Tf for in-scan Vz contractions."""
        return jnp.asarray(self._Tf.reshape(NZ, NZU * NZU * NZU), dtype)

    def jacobians(self, ZU):
        """ZU (H, 21) -> (A (H,17,17), B (H,17,4)): exact F(zu) split."""
        F0, Hf, Tf = self.tensors(ZU.dtype)
        F = (
            F0[None]
            + jnp.einsum("iab,hb->hia", Hf, ZU)
            + 0.5 * jnp.einsum("iabc,hb,hc->hia", Tf, ZU, ZU)
        )
        return F[:, :, :NZ], F[:, :, NZ:]

    def hamiltonian_hessians(self, ZU, Lam):
        """ZU (H,21), Lam (H,17) -> H2 (H,21,21): hess_zu (lam . f)(zu), exact."""
        F0, Hf, Tf = self.tensors(ZU.dtype)
        return jnp.einsum("hi,iab->hab", Lam, Hf) + jnp.einsum(
            "hi,iabc,hc->hab", Lam, Tf, ZU
        )


# ---------------------------------------------------------------------------
# Explicit sparse closed forms (faster than the dense Taylor contractions:
# Tf has ~0.1% nonzeros, so the einsum path wastes almost all its FLOPs).
# Validated against the Taylor/autodiff path in tests/test_analytic.py.
# ---------------------------------------------------------------------------

def explicit_jacobians(ZU, params: QuadParams, dt: float):
    """ZU (H,21) -> (A (H,17,17), B (H,17,4)), exact, closed form.

    Hand-derived from the ODE (quad_model.py:106-119); see the block comments
    for each term. Vectorized over the leading axis."""
    dtype = ZU.dtype
    Hn = ZU.shape[0]
    w0, x0_, y0, z0_ = ZU[:, 6], ZU[:, 7], ZU[:, 8], ZU[:, 9]
    om = ZU[:, 10:13]
    u = ZU[:, NZ:]
    T = jnp.sum(u, axis=1)  # total thrust
    m = params.mass
    Jd = jnp.asarray([params.Jx, params.Jy, params.Jz], dtype)

    A = jnp.zeros((Hn, NZ, NZ), dtype)
    A = A + jnp.eye(NZ, dtype=dtype).at[13:, 13:].set(0.0)[None]

    # dr/dv
    A = A.at[:, 0:3, 3:6].add(dt * jnp.eye(3, dtype=dtype)[None])

    # dv/dq: dt*(T/m) * D(q), rows of d c(q)/dq with c = third row of C_B_I
    s = dt * T / m
    D = jnp.stack(
        [
            jnp.stack([2 * y0, 2 * z0_, 2 * w0, 2 * x0_], axis=1),
            jnp.stack([-2 * x0_, -2 * w0, 2 * z0_, 2 * y0], axis=1),
            jnp.stack([jnp.zeros_like(x0_), -4 * x0_, -4 * y0, jnp.zeros_like(x0_)], axis=1),
        ],
        axis=1,
    )  # (H,3,4)
    A = A.at[:, 3:6, 6:10].add(s[:, None, None] * D)

    # dq/dq: dt * 0.5 * Omega(omega)
    zer = jnp.zeros_like(w0)
    Om = jnp.stack(
        [
            jnp.stack([zer, -om[:, 0], -om[:, 1], -om[:, 2]], axis=1),
            jnp.stack([om[:, 0], zer, om[:, 2], -om[:, 1]], axis=1),
            jnp.stack([om[:, 1], -om[:, 2], zer, om[:, 0]], axis=1),
            jnp.stack([om[:, 2], om[:, 1], -om[:, 0], zer], axis=1),
        ],
        axis=1,
    )
    A = A.at[:, 6:10, 6:10].add(0.5 * dt * Om)

    # dq/dom: dt * 0.5 * G(q)
    G = jnp.stack(
        [
            jnp.stack([-x0_, -y0, -z0_], axis=1),
            jnp.stack([w0, -z0_, y0], axis=1),
            jnp.stack([z0_, w0, -x0_], axis=1),
            jnp.stack([-y0, x0_, w0], axis=1),
        ],
        axis=1,
    )
    A = A.at[:, 6:10, 10:13].add(0.5 * dt * G)

    # dom/dom: dt * (-J^-1) * ([om]x J - [J om]x)
    # W = [om]x @ diag(J) - [J om]x  (derivative of om x J om)
    Jw = om * Jd[None, :]
    ox, oy, oz = om[:, 0], om[:, 1], om[:, 2]
    Jx_, Jy_, Jz_ = Jd[0], Jd[1], Jd[2]
    W = jnp.stack(
        [
            jnp.stack([zer, -Jy_ * oz + Jw[:, 2], Jz_ * oy - Jw[:, 1]], axis=1),
            jnp.stack([Jx_ * oz - Jw[:, 2], zer, -Jz_ * ox + Jw[:, 0]], axis=1),
            jnp.stack([-Jx_ * oy + Jw[:, 1], Jy_ * ox - Jw[:, 0], zer], axis=1),
        ],
        axis=1,
    )
    A = A.at[:, 10:13, 10:13].add(-dt * W / Jd[None, :, None])

    # B: dv/du = dt*c(q)/m per column; dom/du = dt*J^-1*mixer; u_prev rows = I
    c1 = 2 * (x0_ * z0_ + w0 * y0)
    c2 = 2 * (y0 * z0_ - w0 * x0_)
    c3 = 1 - 2 * (x0_ * x0_ + y0 * y0)
    cvec = jnp.stack([c1, c2, c3], axis=1)  # (H,3)
    B = jnp.zeros((Hn, NZ, NU), dtype)
    B = B.at[:, 3:6, :].set((dt / m) * cvec[:, :, None] * jnp.ones((1, 1, NU), dtype))
    l2 = params.l / 2.0
    cc = params.c
    mix = jnp.asarray(
        [[0.0, -l2, 0.0, l2], [-l2, 0.0, l2, 0.0], [cc, -cc, cc, -cc]], dtype
    )
    B = B.at[:, 10:13, :].set(dt * (mix / Jd[:, None])[None])
    B = B.at[:, 13:17, :].set(jnp.eye(NU, dtype=dtype)[None])
    return A, B


def explicit_h2(zu, lam, params: QuadParams, dt: float):
    """Single-step hess_zu(lam . f_aug)(zu): exact sparse closed form.

    Nonzero blocks (x dt):
      (q,q):   (T/m) sum_i lam_v[i] * S_i   (constant S_i from c(q))
      (q,u):   (1/m) D(q)^T lam_v, identical for each rotor column
      (q,om):  0.5 * d(G(q)^T lam_q)/dq
      (om,om): -sum_i (lam_om/J)_i * hess(om x J om)_i
    """
    dtype = zu.dtype
    m = params.mass
    Jd = jnp.asarray([params.Jx, params.Jy, params.Jz], dtype)
    q = zu[6:10]
    lv = lam[3:6]
    lq = lam[6:10]
    lw = lam[10:13]
    u = zu[NZ:]
    T = jnp.sum(u)

    H2 = jnp.zeros((NZU, NZU), dtype)

    # (q,q): (T/m) * (lv1*S1 + lv2*S2 + lv3*S3)
    z = jnp.zeros((), dtype)
    a = lv[0]
    b = lv[1]
    c_ = lv[2]
    # S1: c1=2(xz+wy): sym(w,y)=2, sym(x,z)=2
    # S2: c2=2(yz-wx): sym(w,x)=-2, sym(y,z)=2
    # S3: c3=1-2(x^2+y^2): diag(0,-4,-4,0)
    Sqq = jnp.array(
        [
            [z, -2 * b, 2 * a, z],
            [-2 * b, -4 * c_, z, 2 * a],
            [2 * a, z, -4 * c_, 2 * b],
            [z, 2 * a, 2 * b, z],
        ]
    )
    H2 = H2.at[6:10, 6:10].add(dt * (T / m) * Sqq)

    # (q, u_j): h = (1/m) D(q)^T lv for every column j
    w0, x0_, y0, z0_ = q[0], q[1], q[2], q[3]
    Dq = jnp.array(
        [
            [2 * y0, 2 * z0_, 2 * w0, 2 * x0_],
            [-2 * x0_, -2 * w0, 2 * z0_, 2 * y0],
            [z, -4 * x0_, -4 * y0, z],
        ]
    )
    h = (dt / m) * (Dq.T @ lv)  # (4,)
    H2 = H2.at[6:10, NZ:].add(h[:, None] * jnp.ones((1, NU), dtype))
    H2 = H2.at[NZ:, 6:10].add(h[None, :] * jnp.ones((NU, 1), dtype))

    # (q, om): 0.5 * dt * P with columns grad_q (G^T lq)_b
    P = jnp.array(
        [
            [lq[1], lq[2], lq[3]],
            [-lq[0], lq[3], -lq[2]],
            [-lq[3], -lq[0], lq[1]],
            [lq[2], -lq[1], -lq[0]],
        ]
    )
    H2 = H2.at[6:10, 10:13].add(0.5 * dt * P)
    H2 = H2.at[10:13, 6:10].add(0.5 * dt * P.T)

    # (om, om): -(lw/J)-weighted hessians of (om x J om)
    mu = lw / Jd
    d1 = (Jd[2] - Jd[1]) * mu[0]
    d2 = (Jd[0] - Jd[2]) * mu[1]
    d3 = (Jd[1] - Jd[0]) * mu[2]
    Sww = jnp.array(
        [
            [z, d3, d2],
            [d3, z, d1],
            [d2, d1, z],
        ]
    )
    H2 = H2.at[10:13, 10:13].add(-dt * Sww)
    return H2

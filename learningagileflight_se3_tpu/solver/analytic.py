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

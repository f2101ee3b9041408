"""Quaternion / rotation math (pure JAX, wxyz convention).

Semantics mirror the reference's L1 math layer:
  - `quat_to_dcm_w2b`  == Quadrotor.dir_cosine (quad_model.py:637-643): the
    direction-cosine matrix C_B_I mapping world-frame vectors into the body
    frame, for a unit quaternion q = [w, x, y, z].
  - `omega_matrix`     == Quadrotor.omega (quad_model.py:653-660): the 4x4
    matrix such that q_dot = 0.5 * Omega(w) @ q.
  - `quat_mul`         == Quadrotor.quaternion_mul (quad_model.py:662-667).
  - `axis_angle_to_quat` == toQuaternion (quad_model.py:818-825).
  - `rodrigues_to_axis_angle` == Rd2Rp (quad_policy.py:10-13), including the
    1e-8 x-regularizer that avoids 0/0 at zero rotation.

All functions are shape-polymorphic over leading batch dims only through
`jax.vmap`; bodies are written for single quaternions/vectors so they stay
trivially fusible.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v, eps: float = 0.0):
    """Unit vector v/|v| (solid_geometry.py:11-12). No epsilon by default to
    match reference semantics; pass eps for safe differentiation at 0."""
    n = jnp.sqrt(jnp.sum(v * v) + eps)
    return v / n


def skew(v):
    """3x3 cross-product matrix (quad_model.py:645-651)."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.array(
        [
            [z, -v[2], v[1]],
            [v[2], z, -v[0]],
            [-v[1], v[0], z],
        ]
    )


def quat_to_dcm_w2b(q):
    """C_B_I: world -> body direction cosine matrix for q=[w,x,y,z]
    (quad_model.py:637-643). Not normalized internally — mirrors reference."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)],
            [2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)],
            [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_to_dcm_b2w(q):
    """C_I_B: body -> world rotation matrix (transpose of C_B_I)."""
    return quat_to_dcm_w2b(q).T


def omega_matrix(w):
    """4x4 Omega(w) with q_dot = 0.5 * Omega(w) q (quad_model.py:653-660)."""
    z = jnp.zeros((), dtype=w.dtype)
    return jnp.array(
        [
            [z, -w[0], -w[1], -w[2]],
            [w[0], z, w[2], -w[1]],
            [w[1], -w[2], z, w[0]],
            [w[2], w[1], -w[0], z],
        ]
    )


def quat_mul(p, q):
    """Hamilton product, wxyz (quad_model.py:662-667)."""
    return jnp.array(
        [
            p[0] * q[0] - p[1] * q[1] - p[2] * q[2] - p[3] * q[3],
            p[0] * q[1] + p[1] * q[0] + p[2] * q[3] - p[3] * q[2],
            p[0] * q[2] - p[1] * q[3] + p[2] * q[0] + p[3] * q[1],
            p[0] * q[3] + p[1] * q[2] - p[2] * q[1] + p[3] * q[0],
        ]
    )


def quat_conj(q):
    """Quaternion conjugate [w, -x, -y, -z] (quad_model.py:836-841)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def axis_angle_to_quat(angle, axis):
    """Unit quaternion from (angle, axis); axis normalized internally
    (toQuaternion, quad_model.py:818-825)."""
    axis = jnp.asarray(axis)
    axis = axis / jnp.linalg.norm(axis)
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])


def rodrigues_to_axis_angle(w):
    """Rd2Rp (quad_policy.py:10-13): theta = 2*atan(|w|), axis = (w+[1e-8,0,0])/|...|.

    The reference's Rodrigues-like 3-vector parameterizes the traversal
    attitude; the tiny x-offset regularizes the zero-rotation direction."""
    theta = 2.0 * jnp.arctan(jnp.linalg.norm(w))
    reg = w + jnp.array([1e-8, 0.0, 0.0], dtype=w.dtype)
    axis = reg / jnp.linalg.norm(reg)
    return theta, axis


def rodrigues_to_quat(w):
    """Composition Rd2Rp -> toQuaternion used throughout the reference
    (quad_policy.py:71,203), in closed form:

        theta/2 = atan(|w|)  =>  cos = 1/sqrt(1+|w|^2), sin*axis = w/sqrt(1+|w|^2)

    This is algebraically the reference's composition with its 1e-8 axis
    regularizer dropped — values agree within 1.5e-8 everywhere — but it is
    SMOOTH at w = 0, where the norm-then-normalize form has a 0/0 gradient:
    jax.grad through the composed form returns NaN at zero rotation, which
    silently poisoned the analytic (PDP) learning signal's angle components
    whenever the attitude passed through identity."""
    w = jnp.asarray(w)
    s = 1.0 / jnp.sqrt(1.0 + jnp.sum(w * w))
    return jnp.concatenate([s[None], s * w])


def dcm_to_quat(R):
    """Rotation matrix (body->world) -> unit quaternion wxyz.

    Branch-free Shepperd-style: computes all four candidate quaternions and
    selects the best-conditioned one with `where`, so it is safe under jit/vmap
    (used by gate.transform, quad_model.py:793-811, which the reference does
    via scipy Rotation on the host)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 >= 0 (clamped for sqrt safety)
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # candidate built from the largest component (numerically best)
    cands = jnp.stack(
        [
            jnp.array([qw2, m21 - m12, m02 - m20, m10 - m01]),
            jnp.array([m21 - m12, qx2, m01 + m10, m02 + m20]),
            jnp.array([m02 - m20, m01 + m10, qy2, m12 + m21]),
            jnp.array([m10 - m01, m02 + m20, m12 + m21, qz2]),
        ]
    )
    mags = jnp.stack([qw2, qx2, qy2, qz2])
    idx = jnp.argmax(mags)
    q = cands[idx]
    q = q / (2.0 * jnp.sqrt(jnp.maximum(mags[idx], 1e-12)))
    # canonical sign: w >= 0
    return jnp.where(q[0] < 0, -q, q)

"""Traversal-time fixed-point solver (reference quad_moving.py:29-57).

Iterates  t1 <- t1 + (t2 - t1)/2,  t2 = DNN2(window inputs at the gate pose
predicted t1 seconds ahead)[6]  until |t2 - t1| <= tol, as a
`lax.while_loop` (jit/vmap-safe, with an iteration cap the reference lacks —
a diverging fixed point would hang the reference's while loop).

Gate prediction semantics (quad_moving.py:36-42): translate the CURRENT gate
by velo*t1 and rotate_y by w*t1, then build the 18-dim window input
(width |p0-p1|, pitch atan(dz/dx), window-frame state + final point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.geometry.gate import (
    rotate_y,
    translate,
    window_inputs,
)


def make_traversal_time_solver(model2, tol: float = 1e-3, max_iters: int = 100):
    """solver(nn2_params, quad_state, final_point, gate_pts, velo, w) -> t.

    tol: 1e-3 main variant (quad_moving.py:45) / 1e-2 PyBullet fork."""

    def predict_t(nn2_params, state, final_point, gate_pts, velo, t1, w):
        pts = rotate_y(translate(gate_pts, velo * t1), w * t1)
        inp = window_inputs(pts, state, final_point)
        return model2.apply(nn2_params, inp)[6]

    def solve(nn2_params, state, final_point, gate_pts, velo, w):
        centroid = jnp.mean(gate_pts, axis=0)
        t1 = jnp.linalg.norm(centroid - state[0:3]) / 3.0  # t_guess (line 32)
        t2 = predict_t(nn2_params, state, final_point, gate_pts, velo, t1, w)

        def cond(carry):
            t1, t2, it = carry
            return (jnp.abs(t2 - t1) > tol) & (it < max_iters)

        def body(carry):
            t1, t2, it = carry
            t1 = t1 + (t2 - t1) / 2.0
            t2 = predict_t(nn2_params, state, final_point, gate_pts, velo, t1, w)
            return (t1, t2, it + 1)

        t1, t2, _ = jax.lax.while_loop(cond, body, (t1, t2, jnp.zeros((), jnp.int32)))
        return t1

    return solve

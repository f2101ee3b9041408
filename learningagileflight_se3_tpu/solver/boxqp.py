"""Small box-constrained QP solver (projected Newton, fixed iteration count).

Solves   min_d  0.5 d^T H d + g^T d   s.t.  lo <= d <= hi
for the tiny (n_ctrl = 4) per-timestep QPs of the control-limited iLQR
backward pass (the TPU-native replacement for IPOPT's handling of the rotor
thrust bounds [0, 2.44] N, reference quad_policy.py:46-51).

Everything is branch-free and fixed-shape: the active set is a mask, the
"free-subspace" Newton solve is a full-size solve on a masked matrix, and the
iteration count is static so the whole thing jits/vmaps cleanly and lowers to
a handful of 4x4 ops on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_solve(H, rhs, free):
    """Solve H_ff x_f = rhs_f on the free subset, x=0 on clamped dims.

    Implemented as a full-size solve of M x = (rhs*free) with
    M = F H F + (I - F), F = diag(free): exact on the free block, identity on
    the clamped block."""
    n = H.shape[0]
    F = free[:, None] * free[None, :]
    M = H * F + jnp.diag(1.0 - free)
    x = jnp.linalg.solve(M, rhs * free)
    return x * free


def boxqp(H, g, lo, hi, iters: int = 12):
    """Returns (d, free_mask, Hff_inv_like) for the box QP.

    free_mask marks coordinates not clamped at a bound with inward gradient;
    callers zero the corresponding feedback rows (Tassa et al. 2014 style).
    """
    n = g.shape[0]
    d0 = jnp.clip(jnp.zeros_like(g), lo, hi)

    def body(_, d):
        grad = g + H @ d
        at_lo = (d <= lo + 1e-12) & (grad > 0)
        at_hi = (d >= hi - 1e-12) & (grad < 0)
        free = 1.0 - (at_lo | at_hi).astype(d.dtype)
        step = _masked_solve(H, -grad, free)

        # fixed three-point backtracking on the quadratic objective
        def qobj(x):
            return 0.5 * x @ (H @ x) + g @ x

        cands = jnp.stack(
            [
                jnp.clip(d + step, lo, hi),
                jnp.clip(d + 0.5 * step, lo, hi),
                jnp.clip(d + 0.25 * step, lo, hi),
                d,
            ]
        )
        vals = jax.vmap(qobj)(cands)
        return cands[jnp.argmin(vals)]

    d = jax.lax.fori_loop(0, iters, body, d0)

    grad = g + H @ d
    at_lo = (d <= lo + 1e-12) & (grad > 0)
    at_hi = (d >= hi - 1e-12) & (grad < 0)
    free = 1.0 - (at_lo | at_hi).astype(d.dtype)
    return d, free

"""Pallas Riccati-backward kernel vs the plain-JAX reference (interpret mode
on CPU; the real Mosaic compile path is exercised on TPU by bench/solver)."""

import numpy as np
import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
from learningagileflight_se3_tpu.core.rotations import rodrigues_to_quat
from learningagileflight_se3_tpu.ops.riccati_pallas import (
    riccati_backward_pallas,
    riccati_backward_reference,
)
from learningagileflight_se3_tpu.solver.analytic import (
    explicit_jacobians,
    make_cost_quadratics,
    make_final_quadratics,
)

PQ, CW = QuadParams(), CostWeights()


def _problem_data(rng, H=6, B=128, dtype=jnp.float32):
    """Random-but-plausible trajectory data in time-major batch-last layout."""
    cfg = SolverConfig(horizon=H)
    quad = make_cost_quadratics(CW, cfg)
    fq = make_final_quadratics(CW)

    def one(seed):
        # moderate, well-conditioned data: random stiff/indefinite
        # quadratics make the f32 value recursion overflow, which is not a
        # meaningful comparison regime
        r = np.random.default_rng(seed)
        Z = np.zeros((H + 1, 17))
        Z[:, 0:3] = r.normal(size=(H + 1, 3)) * 2
        Z[:, 3:6] = r.normal(size=(H + 1, 3)) * 0.5
        q = r.normal(size=(H + 1, 4)) * 0.3
        q[:, 0] += 1.0
        Z[:, 6:10] = q / np.linalg.norm(q, axis=1, keepdims=True)
        Z[:, 10:13] = r.normal(size=(H + 1, 3)) * 0.3
        Z[:, 13:17] = r.uniform(0, 2.44, size=(H + 1, 4))
        U = r.uniform(0.1, 2.3, size=(H, 4))
        U[0, 0] = 0.0    # clamped-at-bound cases
        U[1, 2] = 2.44
        tw = 2.0 * np.exp(-10 * (0.1 * np.arange(H) - 0.3) ** 2)
        goal = r.normal(size=3)
        tra_pos = r.normal(size=3)
        tq = np.asarray(rodrigues_to_quat(jnp.asarray(r.normal(size=3) * 0.3)))
        Zj = jnp.asarray(Z, dtype)
        Uj = jnp.asarray(U, dtype)
        ZU = jnp.concatenate([Zj[:-1], Uj], axis=1)
        A, Bm = explicit_jacobians(ZU, PQ, 0.1)
        lz, lu, lzz, luz, luu = quad(
            Zj[:-1], Uj, jnp.asarray(tw, dtype), jnp.asarray(goal, dtype),
            jnp.asarray(tra_pos, dtype), jnp.asarray(tq, dtype),
        )
        pz, pzz = fq(Zj[-1], jnp.asarray(goal, dtype))
        return A, Bm, lz, lu, lzz, luz, luu, Uj, ZU, pz, pzz

    outs = [one(s) for s in range(B)]
    stacked = [jnp.stack([o[i] for o in outs], axis=-1) for i in range(11)]
    reg = jnp.asarray(
        np.random.default_rng(9).uniform(0.01, 2.0, size=(1, B)), dtype
    )
    return stacked, reg


class TestRiccatiKernel:
    def test_interpret_matches_reference(self, rng):
        H, B = 6, 128
        data, reg = _problem_data(rng, H=H, B=B, dtype=jnp.float32)
        A, Bm, lz, lu, lzz, luz, luu, U, ZU, pz, pzz = data
        args = (A, Bm, lz, lu, lzz, luz, luu, U, ZU, pz, pzz, reg)
        kw = dict(params=PQ, dt=0.1, lb=0.0, ub=2.44, boxqp_iters=6, use_ddp=True)
        kk_p, KK_p, d1_p, d2_p, f_p = riccati_backward_pallas(
            *args, **kw, interpret=True
        )
        kk_r, KK_r, d1_r, d2_r, f_r = riccati_backward_reference(*args, **kw)
        np.testing.assert_allclose(np.asarray(kk_p), np.asarray(kk_r), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(KK_p), np.asarray(KK_r), atol=2e-4, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_r), atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_r), atol=1e-3, rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_r))

    def test_no_ddp_variant(self, rng):
        H, B = 4, 128
        data, reg = _problem_data(rng, H=H, B=B, dtype=jnp.float32)
        args = (*data, reg)
        kw = dict(params=PQ, dt=0.1, lb=0.0, ub=2.44, boxqp_iters=4, use_ddp=False)
        kk_p, KK_p, *_ = riccati_backward_pallas(*args, **kw, interpret=True)
        kk_r, KK_r, *_ = riccati_backward_reference(*args, **kw)
        np.testing.assert_allclose(np.asarray(kk_p), np.asarray(kk_r), atol=2e-4, rtol=1e-3)

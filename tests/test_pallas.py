"""Pallas Riccati-backward kernel vs the plain-JAX reference (interpret mode
on CPU; the real Mosaic compile path is exercised on TPU by bench/solver)."""

import numpy as np
import pytest

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


def _problem_data(rng, H=6, B=128, dtype=jnp.float32, raw=False):
    """Random-but-plausible trajectory data in time-major batch-last layout.

    With raw=True additionally returns the raw problem inputs
    (t_w, goal, tra_pos, Hatt, att0) the fused kernel consumes."""
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
        derivs = (A, Bm, lz, lu, lzz, luz, luu, Uj, ZU, pz, pzz)
        if not raw:
            return derivs
        from learningagileflight_se3_tpu.core.rotations import quat_to_dcm_w2b
        from learningagileflight_se3_tpu.solver.analytic import attitude_curvature
        tqj = jnp.asarray(tq, dtype)
        Hatt = attitude_curvature(tqj)
        att0 = 3.0 - jnp.trace(quat_to_dcm_w2b(tqj))
        return derivs + (
            jnp.asarray(tw, dtype), jnp.asarray(goal, dtype),
            jnp.asarray(tra_pos, dtype), Hatt, att0[None],
        )

    outs = [one(s) for s in range(B)]
    n = 16 if raw else 11
    stacked = [jnp.stack([o[i] for o in outs], axis=-1) for i in range(n)]
    reg = jnp.asarray(
        np.random.default_rng(9).uniform(0.01, 2.0, size=(1, B)), dtype
    )
    if raw:
        return stacked[:11], stacked[11:], reg
    return stacked, reg


class TestRiccatiKernel:
    def test_interpret_matches_reference(self, rng):
        H, B = 6, 128
        data, reg = _problem_data(rng, H=H, B=B, dtype=jnp.float32)
        A, Bm, lz, lu, lzz, luz, luu, U, ZU, pz, pzz = data
        args = (A, Bm, lz, lu, lzz, luz, luu, U, ZU, pz, pzz, reg)
        kw = dict(params=PQ, dt=0.1, lb=0.0, ub=2.44, boxqp_iters=6, use_ddp=True)
        kk_p, KK_p, d1_p, d2_p, f_p, pg_p = riccati_backward_pallas(
            *args, **kw, interpret=True
        )
        kk_r, KK_r, d1_r, d2_r, f_r, pg_r = riccati_backward_reference(*args, **kw)
        np.testing.assert_allclose(np.asarray(kk_p), np.asarray(kk_r), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(KK_p), np.asarray(KK_r), atol=2e-4, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_r), atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_r), atol=1e-3, rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_r))
        np.testing.assert_allclose(np.asarray(pg_p), np.asarray(pg_r), atol=1e-3, rtol=1e-3)

    def test_fused_projected_gradient_vs_adjoint_scan(self, rng):
        """pg from the fused adjoint recursion == the standalone XLA scan it
        replaced (lam_{k} = lz_k + A_k^T lam_{k+1}; g_u = lu + B^T lam)."""
        H, B = 6, 128
        data, reg = _problem_data(rng, H=H, B=B, dtype=jnp.float32)
        A, Bm, lz, lu, lzz, luz, luu, U, ZU, pz, pzz = data
        kw = dict(params=PQ, dt=0.1, lb=0.0, ub=2.44, boxqp_iters=6, use_ddp=True)
        *_, pg_p = riccati_backward_pallas(*data, reg, **kw, interpret=True)

        def adj(lam, inp):
            a, lz_k = inp
            return lz_k + jnp.einsum("ijb,ib->jb", a, lam), lam

        _, lam_next = jax.lax.scan(adj, pz, (A, lz), reverse=True)
        gu = lu + jnp.einsum("hiab,hib->hab", Bm, lam_next)
        lbv, ubv = 0.0, 2.44
        eps_b = 1e-7 * (ubv - lbv)
        free = ~(((U <= lbv + eps_b) & (gu > 0)) | ((U >= ubv - eps_b) & (gu < 0)))
        pg_scan = jnp.max(jnp.abs(gu) * free, axis=(0, 1))
        np.testing.assert_allclose(
            np.asarray(pg_p), np.asarray(pg_scan), atol=1e-3, rtol=1e-3
        )

    def test_no_ddp_variant(self, rng):
        H, B = 4, 128
        data, reg = _problem_data(rng, H=H, B=B, dtype=jnp.float32)
        args = (*data, reg)
        kw = dict(params=PQ, dt=0.1, lb=0.0, ub=2.44, boxqp_iters=4, use_ddp=False)
        kk_p, KK_p, *_ = riccati_backward_pallas(*args, **kw, interpret=True)
        kk_r, KK_r, *_ = riccati_backward_reference(*args, **kw)
        np.testing.assert_allclose(np.asarray(kk_p), np.asarray(kk_r), atol=2e-4, rtol=1e-3)


class TestFusedRiccatiKernel:
    def test_fused_matches_unfused_pipeline(self, rng):
        """riccati_backward_fused (raw trajectory in, derivatives computed
        in-kernel) == XLA derivatives + riccati_backward_reference, element
        for element (NaN patterns included — a few random lanes are f32-
        unstable by construction and must explode identically)."""
        from learningagileflight_se3_tpu.ops.riccati_fused import (
            riccati_backward_fused,
        )

        H, B = 6, 128
        derivs, raws, reg = _problem_data(rng, H=H, B=B, raw=True)
        tw, goal, tp, Hatt, att0 = raws
        cfg = SolverConfig(horizon=H)
        kw = dict(boxqp_iters=6, use_ddp=True)
        ref = riccati_backward_reference(
            *derivs, reg, params=PQ, dt=0.1, lb=0.0, ub=2.44, **kw
        )
        ZU = derivs[8]
        fus = riccati_backward_fused(
            ZU, tw[:, None, :], goal, tp, Hatt, att0,
            derivs[9], derivs[10], reg, PQ, CW, cfg, **kw, interpret=True,
        )
        tols = dict(kk=5e-3, KK=8e-3, dV1=1e-3, dV2=1e-3, pg=1e-4)
        for name, a, b in zip(["kk", "KK", "dV1", "dV2", "fail", "pg"], fus, ref):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            if name == "fail":
                np.testing.assert_array_equal(a, b)
                continue
            assert (np.isnan(a) == np.isnan(b)).all(), f"{name}: NaN pattern"
            both = np.isfinite(a) & np.isfinite(b)
            rel = np.max(np.abs(a[both] - b[both]) / (np.abs(b[both]) + 1e-2))
            assert rel < tols[name], f"{name}: rel err {rel}"


class TestRolloutKernel:
    @pytest.mark.slow
    def test_fused_rollout_matches_scan(self, rng):
        """rollout_forward_pallas (interpret) == plain per-lane scan of
        feedback + clip + stage cost + Euler step (the XLA path it fused)."""
        from learningagileflight_se3_tpu.costs.gate_costs import (
            final_cost, goal_cost, thrust_cost, traversal_cost,
        )
        from learningagileflight_se3_tpu.dynamics.quadrotor import euler_step
        from learningagileflight_se3_tpu.ops.rollout_pallas import (
            rollout_forward_pallas,
        )

        H, B = 7, 128
        cfg = SolverConfig(horizon=H)
        r = np.random.default_rng(3)
        dtype = jnp.float32

        def rnd(*shape, s=1.0):
            return jnp.asarray(r.normal(size=shape) * s, dtype)

        Z_ref = rnd(H, 17, B, s=0.5)
        q = np.array(Z_ref[:, 6:10, :])
        q[:, 0, :] += 1.0
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        Z_ref = Z_ref.at[:, 6:10, :].set(jnp.asarray(q, dtype))
        U_ref = jnp.asarray(r.uniform(0.0, 2.44, size=(H, 4, B)), dtype)
        kk = rnd(H, 4, B, s=0.2)
        KK = rnd(H, 4, 17, B, s=0.05)
        t_w = jnp.asarray(
            2.0 * np.exp(-10 * (0.1 * np.arange(H) - 0.3) ** 2), dtype
        )[:, None, None] * jnp.ones((1, 1, B), dtype)
        alpha = jnp.asarray(r.uniform(0.1, 1.0, size=(1, B)), dtype)
        goal = rnd(3, B, s=2.0)
        tp = rnd(3, B, s=1.0)
        tq = np.array(rnd(4, B, s=0.3))
        tq[0] += 1.0
        tq = jnp.asarray(tq / np.linalg.norm(tq, axis=0, keepdims=True), dtype)

        Zn_p, Un_p, c_p = rollout_forward_pallas(
            Z_ref, U_ref, kk, KK, t_w, alpha, goal, tp, tq,
            PQ, CW, cfg, interpret=True,
        )

        def one_lane(b):
            def body(carry, k):
                z, c = carry
                dz = z - Z_ref[k, :, b]
                u = U_ref[k, :, b] + alpha[0, b] * kk[k, :, b] + KK[k, :, :, b] @ dz
                u = jnp.clip(u, cfg.u_lb, cfg.u_ub)
                x, up = z[:13], z[13:]
                c = c + (
                    t_w[k, 0, b] * traversal_cost(x, tp[:, b], tq[:, b], CW)
                    + goal_cost(x, goal[:, b], CW)
                    + thrust_cost(u, CW)
                    + CW.w_du * jnp.sum((u - up) ** 2)
                )
                if cfg.w_bound_weight > 0.0:
                    viol = jnp.maximum(jnp.abs(x[10:13]) - cfg.w_bound, 0.0)
                    c = c + cfg.w_bound_weight * jnp.sum(viol**2)
                zn = jnp.concatenate([euler_step(x, u, cfg.dt, PQ), u])
                return (zn, c), (zn, u)

            (zH, c), (Zs, Us) = jax.lax.scan(
                body, (Z_ref[0, :, b], jnp.zeros((), dtype)), jnp.arange(H)
            )
            return Zs, Us, c + final_cost(zH[:13], goal[:, b], CW)

        Zn_r, Un_r, c_r = jax.vmap(one_lane, out_axes=(-1, -1, -1))(jnp.arange(B))
        np.testing.assert_allclose(np.asarray(Un_p), np.asarray(Un_r), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(Zn_p), np.asarray(Zn_r), atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_r), atol=1e-2, rtol=1e-4)

"""Parallel-in-time (associative-scan) Riccati sweep vs the sequential sweep
(SURVEY.md section 5 long-context row / section 7 hard-part 5 — the one
scaling axis the reference has none of)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from learningagileflight_se3_tpu.config import CostWeights, QuadParams, SolverConfig
from learningagileflight_se3_tpu.models.sampler import sample_scenarios, scenario_to_problem
from learningagileflight_se3_tpu.solver.ilqr import make_mpc_solver

PQ = QuadParams()
CW = CostWeights()


def _solve_pair(cfg_kwargs, scen_seed=3, n=4):
    """Solve the same scenario batch with sequential and parallel backward."""
    scen = sample_scenarios(jax.random.PRNGKey(scen_seed), n)
    probs = jax.vmap(scenario_to_problem)(scen)
    t = jnp.clip(jnp.linalg.norm(probs["x0"][:, 0:3], axis=1) / 4.0, 2.0, 4.0)
    sols = {}
    for mode in ("sequential", "parallel"):
        cfg = SolverConfig(backward=mode, **cfg_kwargs)
        solve = jax.jit(jax.vmap(
            make_mpc_solver(PQ, CW, cfg, return_gains=False),
            in_axes=(0, 0, 0, None, None, 0),
        ))
        sols[mode] = solve(
            probs["x0"], jnp.zeros((n, 4)), probs["goal_pos"],
            jnp.zeros(3), jnp.zeros(3), t,
        )
    return sols["sequential"], sols["parallel"]


class TestParallelRiccati:
    def test_first_iteration_identical_unconstrained(self):
        """reg=0-limit, bounds inactive, no DDP second-order terms: the first
        backward sweep of both modes must produce identical gains, hence an
        identical first step — asserted through a 1-iteration solve."""
        kw = dict(
            horizon=16, max_iters=1, use_ddp=False,
            u_lb=-50.0, u_ub=50.0,                 # thrust box inactive
            reg_init=0.0, reg_min=0.0,             # unregularized sweep
            tol=1e-12, gtol=1e-12,
        )
        s_seq, s_par = _solve_pair(kw)
        np.testing.assert_allclose(
            np.asarray(s_par.control_traj), np.asarray(s_seq.control_traj),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(s_par.cost), np.asarray(s_seq.cost), rtol=1e-10
        )

    @pytest.mark.slow
    def test_full_solve_same_optimum(self):
        """On the real (box-constrained, regularized, DDP-defaults) problem
        the two modes may take different paths but must land at the same
        optimum: costs agree to f64 solver tolerance."""
        kw = dict(horizon=30, max_iters=60, tol=1e-9, gtol=1e-7, use_ddp=False)
        s_seq, s_par = _solve_pair(kw)
        Js = np.asarray(s_seq.cost)
        Jp = np.asarray(s_par.cost)
        assert np.all(np.isfinite(Jp))
        assert np.asarray(s_par.converged).all(), "parallel mode did not converge"
        # same basin: relative cost difference < 1% either way (the two modes
        # take different iterate paths; on hard lanes either may stop a hair
        # better — observed: parallel 0.4% BELOW sequential on one lane where
        # sequential hit its iteration cap)
        rel = np.abs(Jp - Js) / np.maximum(np.abs(Js), 1.0)
        assert np.all(rel < 1e-2), f"cost mismatch: {rel}"

    @pytest.mark.slow
    def test_f32_full_solve_comparable_cost(self):
        """float32 — the TPU dtype this small-batch-latency path exists for.
        The associative-scan value-map compositions are worse-conditioned
        than the sequential sweep in f32 (a single sweep's controls can
        differ by O(0.1)); the contract that matters is that the full
        regularized solve is NOT a degradation vs the sequential sweep at
        the same precision: every lane's f32-parallel cost must be within
        1% of the f32-sequential cost (measured agreement ~3e-4). The f64
        solve is NOT the right golden here — on the kink-rich cost either
        f32 mode may converge into a different basin than f64 does (observed
        on one lane: both f32 modes agree at 21499 while f64 finds 11588)."""
        kw = dict(horizon=30, max_iters=60, use_ddp=False, tol=1e-4, gtol=3e-4)
        with jax.enable_x64(False):
            s_seq32, s_par32 = _solve_pair(kw)
        Js = np.asarray(s_seq32.cost, dtype=np.float64)
        Jp = np.asarray(s_par32.cost, dtype=np.float64)
        assert np.all(np.isfinite(Jp))
        rel = np.abs(Jp - Js) / np.maximum(np.abs(Js), 1.0)
        assert np.all(rel < 1e-2), f"f32 parallel cost off by {rel}"

    def test_parallel_is_jit_vmap_safe(self):
        """Factory contract: jittable + vmappable, finite outputs."""
        kw = dict(horizon=12, max_iters=5, use_ddp=False)
        _, s_par = _solve_pair(kw, scen_seed=9, n=3)
        assert np.all(np.isfinite(np.asarray(s_par.control_traj)))
        assert np.all(np.isfinite(np.asarray(s_par.cost)))

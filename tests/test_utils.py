"""Profiling and checkpoint utility tests (SURVEY.md section 5 subsystems)."""

import os

import numpy as np
import jax
import jax.numpy as jnp


class TestStageTimer:
    def test_accumulates_and_reports(self):
        from learningagileflight_se3_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        for _ in range(3):
            with timer("compute"):
                x = timer.block(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
        with timer("other"):
            pass
        lines = []
        totals = timer.report(log_fn=lines.append)
        assert set(totals) == {"compute", "other"}
        assert timer.counts["compute"] == 3
        assert totals["compute"] > 0
        assert len(lines) == 2 and "compute" in lines[0]

    def test_device_trace_writes(self, tmp_path):
        from learningagileflight_se3_tpu.utils.profiling import device_trace

        d = str(tmp_path / "trace")
        with device_trace(d):
            jax.block_until_ready(jnp.arange(8.0) * 2.0)
        found = any(f for _, _, fs in os.walk(d) for f in fs)
        assert found, "no trace files written"

    def test_device_trace_none_is_noop(self):
        from learningagileflight_se3_tpu.utils.profiling import device_trace

        with device_trace(None):
            pass


class TestCheckpoint:
    def test_params_roundtrip(self, tmp_path):
        from learningagileflight_se3_tpu.utils.checkpoint import (
            load_params,
            save_params,
        )

        tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
        p = str(tmp_path / "ck")
        save_params(p, tree)
        back = load_params(p, like=tree)
        for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_state_roundtrip(self, tmp_path):
        import optax

        from learningagileflight_se3_tpu.utils.checkpoint import (
            load_train_state,
            save_train_state,
            train_state_exists,
        )

        params = {"w": jnp.ones((4, 4))}
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        p = str(tmp_path / "state")
        assert not train_state_exists(p)
        save_train_state(p, params, opt_state, epoch=7)
        assert train_state_exists(p)
        p2, os2, e2 = load_train_state(p, params, opt_state)
        assert e2 == 7
        np.testing.assert_array_equal(np.asarray(p2["w"]), np.ones((4, 4)))
        for a, b in zip(jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(os2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

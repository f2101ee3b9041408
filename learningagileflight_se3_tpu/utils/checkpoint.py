"""Checkpointing — replaces the reference's whole-model torch pickles
(`torch.save(model, FILE)` at nn_train.py:42, deep_learning.py:94,
nn_train_2.py:101) with Orbax pytree checkpoints of the Flax params
(framework-portable, resumable, works for sharded arrays)."""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def save_params(path: str, params) -> None:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like=None):
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            # explicit restore_args from `like`, so checkpoints restore onto
            # the CURRENT backend's devices regardless of where they were
            # saved (a TPU-trained artifacts/nn3_1 must load on a CPU clone;
            # the saved sharding names devices that don't exist there)
            restore_args = ocp.checkpoint_utils.construct_restore_args(like)
            return ckptr.restore(path, item=like, restore_args=restore_args)
        return ckptr.restore(path)


def save_train_state(path: str, nn_params, opt_state, epoch: int) -> None:
    """Full training-state checkpoint (params + OPTIMIZER STATE + progress) —
    the mid-run resumability the reference lacks (SURVEY.md section 5: the
    reference restarts each stage from whole-model pickles with fresh Adam
    moments)."""
    save_params(
        path,
        {
            "nn_params": nn_params,
            "opt_state": opt_state,
            "epoch": jax.numpy.asarray(epoch, jax.numpy.int32),
        },
    )


def load_train_state(path: str, nn_params_like, opt_state_like):
    """Restore (nn_params, opt_state, epoch) saved by save_train_state."""
    like = {
        "nn_params": nn_params_like,
        "opt_state": opt_state_like,
        "epoch": jax.numpy.zeros((), jax.numpy.int32),
    }
    st = load_params(path, like=like)
    return st["nn_params"], st["opt_state"], int(st["epoch"])


def train_state_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))

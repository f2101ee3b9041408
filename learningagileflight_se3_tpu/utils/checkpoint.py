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
            return ckptr.restore(path, item=like)
        return ckptr.restore(path)

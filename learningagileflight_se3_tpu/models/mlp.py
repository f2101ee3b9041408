"""Policy networks DNN1 / DNN2 (Flax) — TPU replacement for the reference's
PyTorch `network` (quad_nn.py:119-145).

  DNN1:  9 -> 64 -> 64 -> 7   (nn_train.py:7-9)   scenario -> traversal params
  DNN2: 18 -> 128 -> 128 -> 7 (nn_train_2.py:11-13) window-frame state -> same

Output 7-vector: [tra_pos(3), tra_ang Rodrigues(3), tra_time(1)].

`surrogate_inner_loss` is the reference's `myloss` (quad_nn.py:141-145):
L = <dp, out>, whose theta-gradient is (dr/dout)^T (dout/dtheta) — the
deterministic policy-gradient-through-MPC chain rule (deep_learning.py:75-81).

Weight init defaults to the PyTorch nn.Linear scheme
U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both kernel and bias so training
dynamics match the reference's starting distribution.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_linear_init(scale_by_fan_in: bool = True):
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else shape[-1]
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MLP(nn.Module):
    features: Sequence[int]  # hidden sizes + output size
    torch_init: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        for i, f in enumerate(self.features):
            if self.torch_init:
                kernel_init = _torch_linear_init()

                def bias_init(key, shape, dtype=jnp.float32, _fi=fan_in):
                    bound = 1.0 / jnp.sqrt(jnp.asarray(_fi, dtype))
                    return jax.random.uniform(key, shape, dtype, -bound, bound)

            else:
                kernel_init = nn.initializers.lecun_normal()
                bias_init = nn.initializers.zeros_init()
            x = nn.Dense(f, kernel_init=kernel_init, bias_init=bias_init)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
            fan_in = f
        return x


def make_dnn1(hidden: int = 64):
    """9 -> hidden -> hidden -> 7 (nn_train.py:7-9,15)."""
    return MLP(features=(hidden, hidden, 7))


def make_dnn2(hidden: int = 128):
    """18 -> hidden -> hidden -> 7 (nn_train_2.py:11-13,23)."""
    return MLP(features=(hidden, hidden, 7))


def surrogate_inner_loss(outputs, dp):
    """myloss (quad_nn.py:141-145): sum over batch of <dp_i, out_i>."""
    return jnp.sum(outputs * jax.lax.stop_gradient(dp))

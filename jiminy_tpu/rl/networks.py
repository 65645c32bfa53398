"""Policy/value networks: plain MLPs sized for the MXU.

The reference trains RLlib's default torch MLPs (`rllib/ppo.py`); here the
networks are flax modules whose matmuls run in bfloat16 on the MXU with float32
accumulation — widths default to multiples of 128 to map onto the systolic array.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, f in enumerate(self.features[:-1]):
            x = act(nn.Dense(f, name=f"dense_{i}")(x))
        return nn.Dense(self.features[-1], name="out",
                        kernel_init=nn.initializers.orthogonal(0.01))(x)


class ActorCritic(nn.Module):
    """Gaussian policy + value head with separate torsos."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)
    activation: str = "tanh"
    # Initial exploration scale (the reference CI configs use 1.0 for the toy
    # swing-up solves, `test_training_toys_models.py:72`)
    log_std_init: float = -0.5

    @nn.compact
    def __call__(self, obs):
        mean = MLP((*self.hidden, self.action_dim), self.activation, name="actor")(obs)
        log_std = self.param(
            "log_std", nn.initializers.constant(self.log_std_init), (self.action_dim,)
        )
        value = MLP((*self.hidden, 1), self.activation, name="critic")(obs)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]

"""Impala CNN visual backbone (reference: arp_dt/models/impala/model.py).

Small 3-stack residual CNN -> 256-d features; the from-scratch visual
backbone option for policies (``use_impala_backbone``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class CnnBasicBlock(nn.Module):
    inchan: int = 16
    padding: str = "SAME"

    @nn.compact
    def __call__(self, observation: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(observation)
        x = nn.Conv(self.inchan, kernel_size=(3, 3), padding=self.padding, name="conv0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.inchan, kernel_size=(3, 3), padding=self.padding, name="conv1")(x)
        return observation + x


class CnnDownStack(nn.Module):
    outchan: int = 16
    pool: bool = True
    padding: str = "SAME"
    nblock: int = 2

    @nn.compact
    def __call__(self, observation: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.outchan, kernel_size=(3, 3), padding=self.padding, name="firstconv")(observation)
        if self.pool:
            x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding=self.padding)
        for i in range(self.nblock):
            x = CnnBasicBlock(self.outchan, name=f"block{i}")(x)
        return x


class ImpalaCNN(nn.Module):
    chans: Sequence[int] = (16, 32, 32)
    outsize: int = 256
    padding: str = "SAME"
    final_relu: bool = True
    nblock: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (batch * timestep, h, w, c), scaled to [0, 1]
        for i, outchan in enumerate(self.chans):
            x = CnnDownStack(outchan=outchan, nblock=self.nblock, name=f"stack{i}")(x)
        b = x.shape[0]
        x = x.reshape(b, -1)
        x = nn.relu(x)
        x = nn.Dense(self.outsize, name="dense")(x)
        if self.final_relu:
            x = nn.relu(x)
        return x

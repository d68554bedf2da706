"""Impala CNN visual backbone.

The small residual CNN used as the from-scratch visual option for policies
(``use_impala_backbone``) and as the PPG encoder — functional parity with
arp_dt/models/impala/model.py (3 down-stacks of 16/32/32 channels, 2 residual
blocks each, max-pool downsampling, flatten -> 256-d with final relu).

Implemented as a single flax module: the stack/block structure is driven by
loops over the channel spec rather than nested module classes, which keeps
the param tree flat and the whole forward one fused XLA region.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn


class ImpalaCNN(nn.Module):
    chans: Sequence[int] = (16, 32, 32)
    outsize: int = 256
    nblock: int = 2
    final_relu: bool = True
    # "same": XLA SAME pooling (matches the reference's own flax impala).
    # "torch": explicit pad-1 pooling with the torch max_pool2d(3,2,1) window
    # alignment — required for converted torch PPG experts to act identically
    # (SAME pads asymmetrically on the right; torch pads both sides).
    pool_padding: str = "same"

    @nn.compact
    def __call__(self, x):
        # x: (batch [* timestep], h, w, c), scaled to [0, 1]
        pool_pad = "SAME" if self.pool_padding == "same" else ((1, 1), (1, 1))
        for s, out_ch in enumerate(self.chans):
            x = nn.Conv(out_ch, (3, 3), padding="SAME", name=f"stack{s}_firstconv")(x)
            x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding=pool_pad)
            for b in range(self.nblock):
                residual = x
                y = nn.Conv(out_ch, (3, 3), padding="SAME", name=f"stack{s}_block{b}_conv0")(
                    nn.relu(x)
                )
                y = nn.Conv(out_ch, (3, 3), padding="SAME", name=f"stack{s}_block{b}_conv1")(
                    nn.relu(y)
                )
                x = residual + y
        x = nn.relu(x.reshape(x.shape[0], -1))
        x = nn.Dense(self.outsize, name="dense")(x)
        return nn.relu(x) if self.final_relu else x

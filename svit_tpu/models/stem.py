"""Patchification stem (reference ``slowfast/models/stem_helper.py:290-320``).

A single (2+1)D conv over the clip: kernel (3,7,7), stride (2,4,4) in the SSv2
recipe — 16x224x224 frames become an 8x56x56 latent grid.  Channels-last
(NDTHWC -> tokens) so the conv lowers straight onto the MXU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class PatchEmbed(nn.Module):
    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, T, H, W, C_in] -> (grid [B, T', H', W', dim_out], (T',H',W'))."""
        x = nn.Conv(
            features=self.dim_out,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.stride),
            padding=[(p, p) for p in self.padding],
            dtype=self.dtype,
            name="proj",
        )(x)
        return x, tuple(x.shape[1:4])

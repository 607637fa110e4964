"""CycleGAN-style 3-D ResNet generator (generator.py:7-73).

Reference divergence (documented, intentional): the reference pads by 1 before
a *valid* 7x7x7 stem conv and only repairs the shape when
``num_downsampling_blocks == 2`` (generator.py:35-39,65-67), so its default
3-block configuration cannot reproduce the input shape. This implementation is
the standard shape-preserving CycleGAN generator the reference intends:
reflect-pad 3 + valid 7^3 stem, reflect-pad-1 stride-2 3^3 downsampling,
identity residual blocks, nearest-upsample + 4^3 conv, reflect-pad 3 + valid
7^3 tanh head — output shape == input shape for any number of blocks.

Layout: 'NXYZC' (channels-last) or 'NXCYZ' (the Pallas CXYZ layout engine;
identical parameter tree — see models/layers.ConvND).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vangan_tpu.models.layers import (
    ConvND,
    CycleGANResidualBlock,
    Dtype,
    InstanceNorm,
    he_normal_1d,
    spatial_dropout,
    to_nxcyz,
    to_nxyzc,
    upsample_nearest,
)


class ResNetGenerator3D(nn.Module):
    """3-D ResNet generator (generator.py configuration surface)."""

    filters: int = 32
    num_downsampling_blocks: int = 2
    num_residual_blocks: int = 6
    num_upsample_blocks: int = 2
    stem_dropout: float = 0.5  # SpatialDropout3D(0.5) after the stem (generator.py:42)
    downsample_dropout: float = 0.2  # building_blocks.py:140,195 defaults
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype or x.dtype)
        filters = self.filters
        lt = self.layout
        if lt == "NXCYZ":
            x = to_nxcyz(x)  # metadata-only for C == 1

        # Stem: 7^3 conv + IN(he_normal gamma) + relu + spatial dropout.
        x = ConvND(filters, 7, 1, padding=((3, 3),) * (x.ndim - 2), pad_mode="reflect",
                   use_bias=False, layout=lt, dtype=self.dtype, name="stem_conv")(x)
        x = InstanceNorm(gamma_init=he_normal_1d, act="relu", layout=lt,
                         dtype=self.dtype, name="stem_inorm")(x)
        x = spatial_dropout(self.stem_dropout, n_spatial=x.ndim - 2,
                            name="stem_dropout", layout=lt)(
            x, deterministic=not train
        )

        # Downsampling (building_blocks.downsample defaults: 3^3 stride-2,
        # reflect-pad, IN, relu, spatial dropout 0.2)
        for i in range(self.num_downsampling_blocks):
            filters *= 2
            x = ConvND(filters, 3, 2, padding=((1, 1),) * (x.ndim - 2),
                       pad_mode="reflect", use_bias=False, layout=lt,
                       dtype=self.dtype, name=f"down{i}")(x)
            x = InstanceNorm(gamma_init=he_normal_1d, act="relu", layout=lt,
                             dtype=self.dtype, name=f"down_inorm{i}")(x)
            x = spatial_dropout(self.downsample_dropout, n_spatial=x.ndim - 2,
                                name=f"down_dropout{i}", layout=lt)(
                x, deterministic=not train
            )

        # Residual blocks
        for i in range(self.num_residual_blocks):
            x = CycleGANResidualBlock(filters, layout=lt, dtype=self.dtype, name=f"res{i}")(x)

        # Upsampling (building_blocks.upsample: nearest x2 + 4^3 conv + IN + relu)
        for i in range(self.num_upsample_blocks):
            filters //= 2
            x = upsample_nearest(x, 2, layout=lt)
            x = ConvND(filters, 4, 1, padding="same", use_bias=False, layout=lt,
                       dtype=self.dtype, name=f"up{i}")(x)
            x = InstanceNorm(gamma_init=he_normal_1d, act="relu", layout=lt,
                             dtype=self.dtype, name=f"up_inorm{i}")(x)

        # Head: 7^3 conv + tanh
        x = ConvND(1, 7, 1, padding=((3, 3),) * (x.ndim - 2), pad_mode="reflect", use_bias=True,
                   layout=lt, dtype=self.dtype, name="head")(x)
        if lt == "NXCYZ":
            x = to_nxyzc(x)  # metadata-only
        return jnp.tanh(x.astype(jnp.float32))

"""3-D PatchGAN discriminator (discriminator.py:7-124).

70x70-style receptive-field patch discriminator over volumes: reflect-padded
4^3 stride-2 conv stack with InstanceNorm + LeakyReLU(0.2), per-layer Gaussian
noise with an externally scheduled σ (traced argument — replaces the
reference's layer-state mutation, custom_callback.py:399-424), spatial
dropout, and either a 3^3 patch-logit head (LSGAN) or a flattened Dense(1)
Wasserstein head (discriminator.py:116-119).

For a 128^3 input the patch output is 16^3 x 1 logits.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vangan_tpu.models.layers import (
    ConvND,
    DiscDownsample,
    Dtype,
    GaussianNoise,
    InstanceNorm,
    spatial_dropout,
    to_nxcyz,
    to_nxyzc,
)
from vangan_tpu.ops.pad import reflect_pad


class PatchGANDiscriminator3D(nn.Module):
    """PatchGAN discriminator (discriminator.py configuration surface)."""

    filters: int = 64
    num_downsampling: int = 3
    use_dropout: bool = False
    dropout_rate: float = 0.2
    wasserstein: bool = False
    use_SN: bool = False
    use_input_noise: bool = False
    use_layer_noise: bool = False
    noise_std: float = 0.1
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, noise_std: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        x = x.astype(self.dtype or x.dtype)
        lt = self.layout
        fold_pad = lt == "NXCYZ"
        if fold_pad:
            x = to_nxcyz(x)  # (B,X,Y,Z,1) -> (B,X,1,Y,Z), metadata-only
        else:
            x = reflect_pad(x, 1)
        if self.use_input_noise:
            x = GaussianNoise(self.noise_std, name="input_noise")(
                x, deterministic=not train, stddev=noise_std
            )

        # Without spectral norm, conv0 feeds inorm0 directly — a bias there
        # is exactly IN-cancelled (dead param; see PreActConvBlock docstring).
        # The SN branch has no norm, so its bias is live.
        first_conv = ConvND(
            self.filters, 4, 2,
            padding=((1, 1),) * 3 if fold_pad else "valid",
            pad_mode="reflect", use_bias=self.use_SN, layout=lt, dtype=self.dtype,
            name="conv0",
        )
        if self.use_SN:
            x = nn.SpectralNorm(first_conv)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.2)
        else:
            x = InstanceNorm(act="leaky_relu", layout=lt, dtype=self.dtype,
                             name="inorm0")(first_conv(x))

        num_filters = self.filters
        for block in range(self.num_downsampling):
            num_filters *= 2
            # first two blocks stride 2 reflect-padded; the last stride 1 'same'
            # (discriminator.py:75-103)
            stride2 = block < 2
            x = DiscDownsample(
                filters=num_filters,
                kernel_size=4,
                strides=2 if stride2 else 1,
                padding="valid" if stride2 else "same",
                use_dropout=self.use_dropout,
                dropout_rate=self.dropout_rate,
                use_spec_norm=self.use_SN,
                use_layer_noise=self.use_layer_noise,
                noise_std=self.noise_std,
                layout=lt,
                dtype=self.dtype,
                name=f"down{block}",
            )(x, train=train, noise_std=noise_std)

        if self.use_layer_noise:
            x = GaussianNoise(self.noise_std, name="head_noise")(
                x, deterministic=not train, stddev=noise_std
            )

        x = ConvND(1, 3, 1, padding="same", use_bias=True, layout=lt, dtype=self.dtype,
                   name="head")(x)
        if fold_pad:
            x = to_nxyzc(x)  # (B,Xo,1,Yo,Zo) -> (B,Xo,Yo,Zo,1), metadata-only
        x = x.astype(jnp.float32)

        if self.wasserstein:
            x = x.reshape((x.shape[0], -1))
            x = nn.Dropout(0.2, name="w_dropout")(x, deterministic=not train)
            x = nn.Dense(1, param_dtype=jnp.float32, name="w_dense")(x)
        return x

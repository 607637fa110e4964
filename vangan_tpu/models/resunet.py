"""Deep Residual 3-D U-Net generator — the default VAN-GAN generator.

Re-derivation of ``ResUNet`` (resunet_model.py:185-249) as a flax module:
filter ladder ``[f, 2f, 4f, 8f, 16f]``, stem, ``num_layers`` stride-2
pre-activation residual encoder blocks, two-conv-block bridge, nearest-upsample
(or transposed-conv) + concat + residual decoder blocks, 1x1x1 tanh head.

Reference divergence (documented, intentional): the reference's
'deconv' upsample path reflect-pads *before* a valid 2x2x2 stride-2 transposed
convolution (resunet_model.py:168-174), which produces ``2n+4`` voxels against
a ``2n`` skip and cannot concatenate — it is unusable (VanGan always selects
'simple', vangan.py:114,153). Our 'deconv' path omits the stray pad so both
modes are shape-correct.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vangan_tpu.models.layers import (
    AttentionConcat,
    ConvND,
    Dtype,
    GaussianNoise,
    PreActConvBlock,
    ResUNetResidualBlock,
    Stem,
    channel_axis,
    he_normal,
    to_nxcyz,
    to_nxyzc,
    upsample_nearest,
)


class ResUNet3D(nn.Module):
    """3-D residual U-Net (resunet_model.py:185-249 configuration surface)."""

    upsample_mode: str = "deconv"  # 'deconv' or 'simple'
    dropout: float = 0.2
    dropout_change_per_layer: float = 0.0
    dropout_type: str = "none"
    use_attention_gate: bool = False
    filters: int = 16
    num_layers: int = 4
    output_activation: Optional[str] = "tanh"
    use_input_noise: bool = False
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f = [self.filters * (2**i) for i in range(self.num_layers + 1)]
        x = x.astype(self.dtype or x.dtype)
        lt = self.layout

        if self.use_input_noise:
            x = GaussianNoise(0.2, name="input_noise")(x, deterministic=not train)

        if lt == "NXCYZ":
            # (B, X, Y, Z, 1) -> (B, X, 1, Y, Z): metadata-only for C == 1
            x = to_nxcyz(x)

        x = Stem(f[0], layout=lt, dtype=self.dtype, name="stem")(x)
        skips = [x]

        # Encoder (resunet_model.py:230-233)
        for e in range(1, self.num_layers + 1):
            x = ResUNetResidualBlock(
                f[e],
                strides=2,
                dropout_type=self.dropout_type,
                dropout=self.dropout + (e - 1) * self.dropout_change_per_layer,
                layout=lt,
                dtype=self.dtype,
                name=f"enc{e}",
            )(x, train=train)
            skips.append(x)

        # Bridge (resunet_model.py:236-238)
        # bridge1's conv feeds bridge2's InstanceNorm directly — its bias is
        # exactly IN-cancelled (dead param; see PreActConvBlock docstring)
        x = PreActConvBlock(f[-1], use_bias=False, layout=lt, dtype=self.dtype,
                            name="bridge1")(x)
        x = PreActConvBlock(f[-1], layout=lt, dtype=self.dtype, name="bridge2")(x)

        # Decoder (resunet_model.py:240-243)
        for d in reversed(range(self.num_layers)):
            if self.upsample_mode == "deconv":
                # params identical across layouts; NXCYZ routes through XLA's
                # channels-last transposed conv (non-default mode)
                xl = to_nxyzc(x) if lt == "NXCYZ" else x
                xl = nn.ConvTranspose(
                    features=f[d + 1],
                    kernel_size=(2,) * (xl.ndim - 2),
                    strides=(2,) * (xl.ndim - 2),
                    padding="VALID",
                    kernel_init=he_normal(),
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"deconv{d}",
                )(xl)
                x = to_nxcyz(xl) if lt == "NXCYZ" else xl
            else:
                x = upsample_nearest(x, 2, layout=lt)
            skip_x = skips[d]
            if self.use_attention_gate:
                x = AttentionConcat(layout=lt, dtype=self.dtype, name=f"attn{d}")(x, skip_x)
            else:
                x = jnp.concatenate([x, skip_x], axis=channel_axis(lt))
            x = ResUNetResidualBlock(f[d], layout=lt, dtype=self.dtype, name=f"dec{d}")(
                x, train=train)

        # Head (resunet_model.py:245)
        x = ConvND(1, 1, 1, padding="same", use_bias=True, layout=lt, dtype=self.dtype,
                   name="head")(x)
        if lt == "NXCYZ":
            x = to_nxyzc(x)  # (B, X, 1, Y, Z) -> (B, X, Y, Z, 1), metadata-only
        x = x.astype(jnp.float32)
        if self.output_activation == "tanh":
            x = jnp.tanh(x)
        elif self.output_activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.output_activation is not None:
            raise ValueError(f"unknown output activation {self.output_activation!r}")
        return x

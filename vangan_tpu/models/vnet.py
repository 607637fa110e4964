"""Customisable V-Net / 3-D U-Net generator (vnet_model.py:149-268).

Classic encoder-decoder with two-conv blocks per level, max-pool downsampling,
deconv or upsample+conv upsampling, optional Oktay attention-gated skips, and
an optional input-noise branch (vnet_model.py:203-209).

Quirk preserved: the reference applies the conv *activation before* the
normalisation layer (Keras ``Conv3D(activation=...)`` then BN/IN,
vnet_model.py:119-130), unlike every other model in the zoo.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vangan_tpu.models.layers import (
    AttentionConcat,
    ConvND,
    Dtype,
    InstanceNorm,
    channel_axis,
    make_dropout,
    spatial_axes,
    to_nxcyz,
    to_nxyzc,
    upsample_nearest,
)
from vangan_tpu.ops.norms import min_max_norm, rescale_arr


def max_pool_2x(x: jnp.ndarray, layout: str = "NXYZC") -> jnp.ndarray:
    """MaxPooling3D(2) in either layout (vnet_model.py:223)."""
    window = [1] * x.ndim
    for a in spatial_axes(layout, x.ndim):
        window[a] = 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, tuple(window), tuple(window), "VALID"
    )


class VNetConvBlock(nn.Module):
    """Two reflect-padded convs with act-then-norm and optional dropout
    (vnet_model.py:80-146)."""

    filters: int
    use_batch_norm: bool = True
    dropout: float = 0.3
    dropout_type: str = "spatial"
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(2):
            conv = ConvND(
                self.filters, 3, 1, padding=((1, 1),) * (x.ndim - 2), pad_mode="reflect",
                use_bias=not self.use_batch_norm, layout=self.layout, dtype=self.dtype,
                name=f"conv{i}",
            )
            x = conv(x)
            x = nn.relu(x)  # activation precedes the norm (vnet_model.py:119-130)
            if self.use_batch_norm:
                # epsilon matches Keras BatchNormalization's 1e-3 default
                # (vnet_model.py:127 uses keras defaults; flax's is 1e-5)
                x = nn.BatchNorm(
                    use_running_average=not train, axis=channel_axis(self.layout),
                    epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"bn{i}",
                )(x)
            else:
                x = InstanceNorm(layout=self.layout, dtype=self.dtype, name=f"in{i}")(x)
            if i == 0 and self.dropout > 0.0:
                do = make_dropout(self.dropout_type, self.dropout, n_spatial=x.ndim - 2,
                                  layout=self.layout)
                x = do(x, deterministic=not train)
        return x


class VNet3D(nn.Module):
    """V-Net generator (vnet_model.py:149-268 configuration surface)."""

    num_classes: int = 1
    use_batch_norm: bool = True
    upsample_mode: str = "deconv"  # 'deconv' or 'simple'
    dropout: float = 0.5
    dropout_change_per_layer: float = 0.0
    dropout_type: str = "spatial"
    use_dropout_on_upsampling: bool = False
    use_attention_gate: bool = False
    filters: int = 16
    num_layers: int = 4
    output_activation: Optional[str] = "sigmoid"
    addnoise: bool = False
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype or x.dtype)
        if self.addnoise:
            # input-noise branch (vnet_model.py:203-209): min-max + offset noise,
            # added back to the input, clipped and rescaled to [-1, 1]
            inputs = x
            rng = self.make_rng("noise") if train else jax.random.PRNGKey(0)
            noise = -0.475 + 0.06 * jax.random.normal(rng, x.shape, x.dtype)
            x = min_max_norm(x, axis=tuple(range(1, x.ndim))) + noise
            x = x + inputs
            x = jnp.clip(x, 0.0, 1.0)
            x = rescale_arr(x, -0.5, 0.5)

        lt = self.layout
        if lt == "NXCYZ":
            x = to_nxcyz(x)  # metadata-only for C == 1

        filters = self.filters
        dropout = self.dropout
        down_layers = []
        for layer in range(self.num_layers):
            x = VNetConvBlock(
                filters, self.use_batch_norm, dropout, self.dropout_type, layout=lt,
                dtype=self.dtype, name=f"down{layer}",
            )(x, train=train)
            down_layers.append(x)
            x = max_pool_2x(x, lt)
            dropout += self.dropout_change_per_layer
            filters *= 2

        x = VNetConvBlock(
            filters, self.use_batch_norm, dropout, self.dropout_type, layout=lt,
            dtype=self.dtype, name="bottleneck",
        )(x, train=train)

        if not self.use_dropout_on_upsampling:
            dropout = 0.0
            dropout_change = 0.0
        else:
            dropout_change = self.dropout_change_per_layer

        for i, conv in enumerate(reversed(down_layers)):
            filters //= 2
            dropout -= dropout_change
            if self.upsample_mode == "deconv":
                xl = to_nxyzc(x) if lt == "NXCYZ" else x
                xl = nn.ConvTranspose(
                    features=filters, kernel_size=(2,) * (xl.ndim - 2),
                    strides=(2,) * (xl.ndim - 2), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"deconv{i}",
                )(xl)
                x = to_nxcyz(xl) if lt == "NXCYZ" else xl
            else:
                x = upsample_nearest(x, 2, layout=lt)
                x = ConvND(filters, 3, 1, padding="same", layout=lt, dtype=self.dtype,
                           name=f"upconv{i}")(x)
            if self.use_attention_gate:
                x = AttentionConcat(layout=lt, dtype=self.dtype, name=f"attn{i}")(x, conv)
            else:
                x = jnp.concatenate([x, conv], axis=channel_axis(lt))
            x = VNetConvBlock(
                filters, self.use_batch_norm, dropout, self.dropout_type, layout=lt,
                dtype=self.dtype, name=f"up{i}",
            )(x, train=train)

        x = ConvND(self.num_classes, 1, 1, padding="same", layout=lt, dtype=self.dtype,
                   name="head")(x)
        if lt == "NXCYZ":
            x = to_nxyzc(x)
        x = x.astype(jnp.float32)
        if self.output_activation == "tanh":
            x = jnp.tanh(x)
        elif self.output_activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.output_activation is not None:
            raise ValueError(f"unknown output activation {self.output_activation!r}")
        return x

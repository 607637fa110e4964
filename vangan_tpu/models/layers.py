"""Flax building blocks for the VAN-GAN-TPU model zoo.

TPU-native re-derivations of the reference's Keras layers
(building_blocks.py, resunet_model.py:23-182, vnet_model.py:24-146):

- channels-last ``(B, X, Y, Z, C)`` layout (XLA's native TPU conv layout),
- compute in a configurable dtype (bf16 by default on TPU) with float32
  parameters and float32 normalisation statistics,
- stochastic layers take explicit RNG collections ('dropout', 'noise') and the
  discriminator noise σ is a *traced call argument* — replacing the reference's
  mutation of GaussianNoise.stddev layer state (custom_callback.py:399-424) so
  the noise schedule needs no recompilation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from vangan_tpu.ops.pad import reflect_pad

Dtype = Any

he_normal = nn.initializers.he_normal


def he_normal_1d(key, shape, dtype=jnp.float32):
    """Keras-style he_normal for rank-1 params (fan_in = shape[0]).

    Needed because the reference initialises InstanceNorm *gamma* with
    he_normal in the ResNet generator path (generator.py:14,40); JAX's
    he_normal requires >=2-D shapes.
    """
    fan_in = shape[0]
    stddev = (2.0 / fan_in) ** 0.5 / 0.87962566103423978  # truncated-normal correction
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev


def conv_nd(
    features: int,
    kernel_size: Union[int, Sequence[int]],
    strides: Union[int, Sequence[int]] = 1,
    padding: str = "VALID",
    use_bias: bool = True,
    dtype: Optional[Dtype] = None,
    name: Optional[str] = None,
) -> nn.Conv:
    """A he_normal-initialised N-D convolution (Keras Conv3D defaults parity)."""
    return nn.Conv(
        features=features,
        kernel_size=kernel_size if not isinstance(kernel_size, int) else (kernel_size,) * 3,
        strides=strides if not isinstance(strides, int) else (strides,) * 3,
        padding=padding,
        use_bias=use_bias,
        kernel_init=he_normal(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalisation over spatial dims.

    Equivalent of tfa.layers.InstanceNormalization (epsilon 1e-3, learned
    scale/offset). Statistics are computed in float32 regardless of the compute
    dtype. ``gamma_init`` is configurable because the reference's ResNet
    generator initialises gamma with he_normal (generator.py:14,40).
    """

    epsilon: float = 1e-3
    use_scale: bool = True
    use_bias: bool = True
    gamma_init: Callable = nn.initializers.ones
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        # Statistics accumulate in float32 via the reduction dtype; the
        # elementwise math stays in the compute dtype. (A full f32 cast of the
        # activation would materialise GB-scale padded temporaries at 128^3 —
        # XLA pads the 16-channel minor dim to 128 lanes.)
        mean32 = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        xc = x - mean32.astype(x.dtype)
        var32 = jnp.mean(jax.lax.square(xc), axis=axes, keepdims=True, dtype=jnp.float32)
        inv = jax.lax.rsqrt(var32 + self.epsilon)
        y = xc * inv.astype(x.dtype)
        if self.use_scale:
            gamma = self.param("scale", self.gamma_init, (c,), jnp.float32)
            y = y * gamma.astype(x.dtype)
        if self.use_bias:
            beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y + beta.astype(x.dtype)
        return y.astype(self.dtype or x.dtype)


class GaussianNoise(nn.Module):
    """Additive Gaussian noise, active only in training.

    ``stddev`` may be overridden per call with a traced scalar — the TPU-native
    replacement for the reference's epoch-wise mutation of
    ``layer.stddev`` (custom_callback.py:399-424).
    """

    stddev: float = 0.1
    rng_collection: str = "noise"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, stddev: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if deterministic:
            return x
        std = self.stddev if stddev is None else stddev
        rng = self.make_rng(self.rng_collection)
        return x + jnp.asarray(std, x.dtype) * jax.random.normal(rng, x.shape, x.dtype)


def spatial_dropout(rate: float, n_spatial: int = 3, name: Optional[str] = None) -> nn.Dropout:
    """Keras SpatialDropout3D/2D: drops whole channels (mask broadcast over space)."""
    return nn.Dropout(rate=rate, broadcast_dims=tuple(range(1, 1 + n_spatial)), name=name)


def make_dropout(dropout_type: str, rate: float, n_spatial: int = 3) -> Optional[nn.Dropout]:
    """Reference dropout_type dispatch: 'spatial' | 'standard' | 'none'
    (resunet_model.py:138-141, vnet_model.py:110-117)."""
    if dropout_type == "spatial":
        return spatial_dropout(rate, n_spatial)
    if dropout_type == "standard":
        return nn.Dropout(rate=rate)
    if dropout_type in ("none", None):
        return None
    raise ValueError(f"dropout_type must be 'spatial', 'standard' or 'none', got {dropout_type!r}")


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Keras UpSampling3D(size=2) (nearest-neighbour repeat) for channels-last volumes."""
    for axis in range(1, x.ndim - 1):
        x = jnp.repeat(x, factor, axis=axis)
    return x


class NormAct(nn.Module):
    """InstanceNorm followed by optional ReLU (resunet_model.py:23-39)."""

    act: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = InstanceNorm(dtype=self.dtype, name="inorm")(x)
        if self.act:
            x = nn.relu(x)
        return x


class PreActConvBlock(nn.Module):
    """norm-act -> reflect-pad -> conv (resunet_model.py:42-66)."""

    filters: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = NormAct(dtype=self.dtype, name="norm_act")(x)
        x = reflect_pad(x, self.kernel_size // 2)
        x = conv_nd(
            self.filters, self.kernel_size, self.strides, "VALID", use_bias=True, dtype=self.dtype,
            name="conv",
        )(x)
        return x


class Stem(nn.Module):
    """ResUNet stem: conv + pre-act conv block + 1x1x1-projected identity
    (resunet_model.py:69-100)."""

    filters: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = reflect_pad(x, 1)
        conv = conv_nd(self.filters, 3, 1, "VALID", dtype=self.dtype, name="conv1")(conv)
        conv = PreActConvBlock(self.filters, dtype=self.dtype, name="conv_block")(conv)
        shortcut = conv_nd(self.filters, 1, 1, "SAME", dtype=self.dtype, name="shortcut")(x)
        shortcut = NormAct(act=False, dtype=self.dtype, name="shortcut_norm")(shortcut)
        return conv + shortcut


class ResUNetResidualBlock(nn.Module):
    """Pre-activation residual block with projected shortcut
    (resunet_model.py:103-143)."""

    filters: int
    strides: int = 1
    dropout_type: str = "none"
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = PreActConvBlock(self.filters, strides=self.strides, dtype=self.dtype, name="block1")(x)
        res = PreActConvBlock(self.filters, strides=1, dtype=self.dtype, name="block2")(res)
        shortcut = conv_nd(self.filters, 1, self.strides, "SAME", dtype=self.dtype, name="shortcut")(x)
        shortcut = NormAct(act=False, dtype=self.dtype, name="shortcut_norm")(shortcut)
        out = shortcut + res
        do = make_dropout(self.dropout_type, self.dropout, n_spatial=x.ndim - 2)
        if do is not None:
            out = do(out, deterministic=not train)
        return out


class AttentionGate(nn.Module):
    """Oktay attention gate (vnet_model.py:24-61): additive attention on the
    skip connection."""

    n_intermediate_filters: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inp_1: jnp.ndarray, inp_2: jnp.ndarray) -> jnp.ndarray:
        a = conv_nd(self.n_intermediate_filters, 1, 1, "SAME", dtype=self.dtype, name="conv1")(inp_1)
        b = conv_nd(self.n_intermediate_filters, 1, 1, "SAME", dtype=self.dtype, name="conv2")(inp_2)
        f = nn.relu(a + b)
        g = conv_nd(1, 1, 1, "SAME", dtype=self.dtype, name="conv_out")(f)
        h = nn.sigmoid(g)
        return inp_1 * h


class AttentionConcat(nn.Module):
    """Concat upsampled features with the attention-gated skip (vnet_model.py:64-77)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, conv_below: jnp.ndarray, skip_connection: jnp.ndarray) -> jnp.ndarray:
        below_filters = conv_below.shape[-1]
        gated = AttentionGate(below_filters, dtype=self.dtype, name="gate")(
            skip_connection, conv_below
        )
        return jnp.concatenate([conv_below, gated], axis=-1)


class DiscDownsample(nn.Module):
    """PatchGAN downsample block (building_blocks.py:126-196): optional reflect
    pad + layer noise, strided conv (optionally spectrally normalised),
    InstanceNorm, LeakyReLU, spatial dropout."""

    filters: int
    kernel_size: int = 4
    strides: int = 2
    padding: str = "valid"  # 'valid' (reflect-pad 1) or 'same'
    use_dropout: bool = True
    dropout_rate: float = 0.2
    use_spec_norm: bool = False
    use_layer_noise: bool = False
    noise_std: float = 0.1
    leaky_slope: float = 0.2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, noise_std: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if self.padding == "valid":
            x = reflect_pad(x, 1)
        if self.use_layer_noise:
            x = GaussianNoise(self.noise_std, name="noise")(
                x, deterministic=not train, stddev=noise_std
            )
        conv = conv_nd(
            self.filters, self.kernel_size, self.strides,
            "VALID" if self.padding == "valid" else "SAME",
            use_bias=False, dtype=self.dtype, name="conv",
        )
        if self.use_spec_norm:
            x = nn.SpectralNorm(conv)(x, update_stats=train)
        else:
            x = conv(x)
            x = InstanceNorm(dtype=self.dtype, name="inorm")(x)
        x = nn.leaky_relu(x, self.leaky_slope)
        if self.use_dropout:
            x = spatial_dropout(self.dropout_rate, n_spatial=x.ndim - 2, name="dropout")(
                x, deterministic=not train
            )
        return x


class CycleGANResidualBlock(nn.Module):
    """Post-activation residual block of the ResNet generator
    (building_blocks.py:68-123): two reflect-padded 3x3x3 convs with
    InstanceNorm (he_normal gamma), identity skip."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        gamma = he_normal_1d
        x = reflect_pad(x, 1)
        x = conv_nd(self.dim, 3, 1, "VALID", use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = InstanceNorm(gamma_init=gamma, dtype=self.dtype, name="inorm1")(x)
        x = nn.relu(x)
        x = reflect_pad(x, 1)
        x = conv_nd(self.dim, 3, 1, "VALID", use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = InstanceNorm(gamma_init=gamma, dtype=self.dtype, name="inorm2")(x)
        return inp + x

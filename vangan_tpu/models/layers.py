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

import os
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax import lax

from vangan_tpu.ops.pad import reflect_pad
from vangan_tpu.ops.pallas.conv3d import (
    _norm_padding,
    _norm_stride,
    conv3d_cxyz,
    conv3d_cxyz_fits,
    conv3d_cxyz_reference,
    pallas_active,
)
# NOTE (round 4): the VANGAN_FUSE_PREACT whole-chain fusion (IN folded into
# conv prologues/epilogues, producer-emitted stats threaded between blocks)
# was REMOVED after chip A/Bs measured it a loser in every value case:
# batch-1 train step 1.5456 vs 1.6011 unfused (-3.5%), batch-3 fused
# remat-off HBM OOM, and forward-only inference 47.2 vs 41.5 ms/patch
# (-14%) — the chained kernels' extra prologue/epilogue work costs more
# than the launches they delete (docs/BENCH_SESSION_r3.md, docs/PERF.md).

Dtype = Any

he_normal = nn.initializers.he_normal

# Layouts: 'NXYZC' — channels-last, XLA's native conv layout (round-1 path,
# portable); 'NXCYZ' — the TPU layout engine: sublanes=Y, lanes=Z, channels as
# an outer dim, so C in {1,16,32,48,...} tensors tile with ZERO lane padding
# (docs/PERF.md: channels-last C=16 pads 8-16x and runs convs at ~1.4% MXU).
LAYOUTS = ("NXYZC", "NXCYZ")


def channel_axis(layout: str) -> int:
    return -1 if layout == "NXYZC" else 2


def uniform_pads(p: int, x: jnp.ndarray) -> tuple:
    """Symmetric per-spatial-dim pads matched to the input's rank: ``((p, p),)
    * n_spatial``. Lets every block express the reference's 3-D literals
    (e.g. ``((1, 1),) * 3``) in a form that also serves DIMENSIONS=2 inputs."""
    return ((p, p),) * (x.ndim - 2)


def spatial_axes(layout: str, ndim: int = 5) -> tuple:
    if layout == "NXYZC":
        return tuple(range(1, ndim - 1))
    return (1,) + tuple(range(3, ndim))


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


class ConvND(nn.Module):
    """Layout-dispatching 3-D convolution with nn.Conv-compatible parameters.

    Params are ``kernel`` (kx,ky,kz,Ci,Co) he_normal + optional ``bias`` (Co,)
    — the same pytree as flax ``nn.Conv``, so checkpoints are portable between
    layouts. Padding (incl. the reference's reflect-pad-then-VALID idiom,
    building_blocks.py:15-39) is part of the op: ``pad_mode`` 'zeros'|'reflect'
    with 'same'/'valid'/explicit widths.

    - layout 'NXYZC': host pad + ``lax.conv_general_dilated`` (XLA's native
      channels-last TPU conv) — the round-1 portable path.
    - layout 'NXCYZ': the Pallas CXYZ kernel family (ops/pallas/conv3d.py) on
      TPU; off-TPU (or below ``min_pallas_z`` lanes, where slab overheads beat
      the lane-padding win) the semantics-identical XLA transpose fallback.

    Divergence note (NXCYZ): reflect padding is folded into the conv, so any
    *preceding* stochastic layer samples noise on the unpadded tensor — border
    voxels see reflected noise instead of fresh i.i.d. noise. Statistically
    negligible; the NXYZC path keeps the reference order exactly.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "same"  # 'same' | 'valid' | ((lo,hi),(lo,hi),(lo,hi))
    pad_mode: str = "zeros"
    use_bias: bool = True
    layout: str = "NXYZC"
    min_pallas_z: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # Spatial rank is inferred from the input: 5-D volumes (the default)
        # or 4-D images (cfg.DIMENSIONS == 2 — genuine 2-D support, which the
        # reference half-declares but cannot run: its models are Conv3D-only,
        # docs/PARITY.md #5). 2-D always takes the channels-last XLA path.
        if x.ndim == 4:
            if self.layout == "NXCYZ":
                raise ValueError(
                    "the NXCYZ Pallas layout engine is 3-D only; build 2-D "
                    "models with layout='NXYZC' (factory forces this when "
                    "cfg.DIMENSIONS == 2)"
                )
            n_sp = 2
        else:
            n_sp = 3
        k = (
            (self.kernel_size,) * n_sp
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        ci = x.shape[channel_axis(self.layout)]
        kernel = self.param("kernel", he_normal(), (*k, ci, self.features), jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        stride = _norm_stride(self.strides, n_sp)
        dims = (
            (x.shape[1], x.shape[3], x.shape[4])
            if self.layout == "NXCYZ"
            else tuple(x.shape[1 : 1 + n_sp])
        )
        pads = _norm_padding(self.padding, k, stride, dims)
        return self._plain_conv(x, kernel, bias, k, stride, pads, n_sp)

    def _plain_conv(self, x, kernel, bias, k, stride, pads, n_sp):
        dtype = x.dtype
        ci = x.shape[channel_axis(self.layout)]
        if n_sp == 2:
            if self.pad_mode == "reflect" and any(lo or hi for lo, hi in pads):
                x = jnp.pad(x, ((0, 0), *pads, (0, 0)), mode="reflect")
                pads = ((0, 0),) * 2
            dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(x, kernel, stride, list(pads), dimension_numbers=dn)
            if bias is not None:
                y = y + bias.astype(dtype)
            return y

        if self.layout == "NXCYZ":
            # Pallas pays off where lane padding hurts XLA: small/odd channel
            # counts at z >= min_pallas_z lanes. At C >= 128 channels-last XLA
            # is already well tiled (and the z-lane padding to 128 would waste
            # MXU work), so those levels take the transpose fallback.
            use_pallas = (
                pallas_active()
                and x.shape[-1] >= self.min_pallas_z
                and max(ci, self.features) < 128
                and conv3d_cxyz_fits(
                    x.shape, k, stride, x.dtype.itemsize, co=self.features
                )
            )
            fn = conv3d_cxyz if use_pallas else conv3d_cxyz_reference
            return fn(x, kernel, bias, stride, pads, self.pad_mode)

        if self.pad_mode == "reflect" and any(lo or hi for lo, hi in pads):
            x = jnp.pad(x, ((0, 0), *pads, (0, 0)), mode="reflect")
            pads = ((0, 0),) * 3
        dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NXYZC", "XYZIO", "NXYZC"))
        y = lax.conv_general_dilated(x, kernel, stride, list(pads), dimension_numbers=dn)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y

class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalisation over spatial dims, with an
    optional fused activation epilogue.

    Equivalent of tfa.layers.InstanceNormalization (epsilon 1e-3, learned
    scale/offset) followed by ``act`` (none | relu | leaky_relu). Statistics
    are computed in float32 regardless of the compute dtype. ``gamma_init``
    is configurable because the reference's ResNet generator initialises
    gamma with he_normal (generator.py:14,40).

    On the NXCYZ layout the whole norm+act runs through the fused Pallas
    kernels (ops/pallas/instnorm.py) — the XLA lowering of this reduction
    costs ~10x the bandwidth floor (docs/PERF.md). The jnp fallback is
    numerically equivalent (same f32 statistics).
    """

    epsilon: float = 1e-3
    use_scale: bool = True
    use_bias: bool = True
    gamma_init: Callable = nn.initializers.ones
    act: str = "none"  # 'none' | 'relu' | 'leaky_relu'
    leaky_slope: float = 0.2
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cax = channel_axis(self.layout) % x.ndim
        c = x.shape[cax]
        bshape = [1] * x.ndim
        bshape[cax] = c
        gamma = (
            self.param("scale", self.gamma_init, (c,), jnp.float32)
            if self.use_scale
            else jnp.ones((c,), jnp.float32)
        )
        beta = (
            self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            if self.use_bias
            else jnp.zeros((c,), jnp.float32)
        )
        return apply_instance_norm(
            x, gamma, beta, eps=self.epsilon, act=self.act,
            alpha=self.leaky_slope, layout=self.layout,
            dtype=self.dtype or x.dtype,
        )


def apply_instance_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    eps: float = 1e-3,
    act: str = "none",
    alpha: float = 0.2,
    layout: str = "NXYZC",
    dtype: Optional[Dtype] = None,
) -> jnp.ndarray:
    """Parameter-free InstanceNorm+act dispatch (fused Pallas kernels on the
    NXCYZ layout, jnp otherwise)."""
    from vangan_tpu.ops.pallas.instnorm import (
        instance_norm_act,
        instance_norm_act_supported,
    )

    out_dtype = dtype or x.dtype
    if instance_norm_act_supported(x.shape, layout):
        y = instance_norm_act(x, gamma, beta, eps, act, alpha)
        return y.astype(out_dtype)

    cax = channel_axis(layout) % x.ndim
    bshape = [1] * x.ndim
    bshape[cax] = x.shape[cax]
    axes = spatial_axes(layout, x.ndim)
    # Statistics accumulate in float32 via the reduction dtype; the
    # elementwise math stays in the compute dtype. (A full f32 cast of the
    # activation would materialise GB-scale padded temporaries at 128^3 —
    # XLA pads the 16-channel minor dim to 128 lanes.)
    mean32 = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
    xc = x - mean32.astype(x.dtype)
    var32 = jnp.mean(jax.lax.square(xc), axis=axes, keepdims=True, dtype=jnp.float32)
    inv = jax.lax.rsqrt(var32 + eps)
    y = xc * inv.astype(x.dtype)
    y = y * gamma.astype(x.dtype).reshape(bshape)
    y = y + beta.astype(x.dtype).reshape(bshape)
    if act == "relu":
        y = nn.relu(y)
    elif act == "leaky_relu":
        y = nn.leaky_relu(y, alpha)
    return y.astype(out_dtype)


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


def spatial_dropout(
    rate: float, n_spatial: int = 3, name: Optional[str] = None, layout: str = "NXYZC"
) -> nn.Dropout:
    """Keras SpatialDropout3D/2D: drops whole channels (mask broadcast over space)."""
    dims = spatial_axes(layout, n_spatial + 2)
    return nn.Dropout(rate=rate, broadcast_dims=dims, name=name)


def make_dropout(
    dropout_type: str, rate: float, n_spatial: int = 3, layout: str = "NXYZC"
) -> Optional[nn.Dropout]:
    """Reference dropout_type dispatch: 'spatial' | 'standard' | 'none'
    (resunet_model.py:138-141, vnet_model.py:110-117)."""
    if dropout_type == "spatial":
        return spatial_dropout(rate, n_spatial, layout=layout)
    if dropout_type == "standard":
        return nn.Dropout(rate=rate)
    if dropout_type in ("none", None):
        return None
    raise ValueError(f"dropout_type must be 'spatial', 'standard' or 'none', got {dropout_type!r}")


def upsample_nearest(x: jnp.ndarray, factor: int = 2, layout: str = "NXYZC") -> jnp.ndarray:
    """Keras UpSampling3D(size=2) (nearest-neighbour repeat)."""
    for axis in spatial_axes(layout, x.ndim):
        x = jnp.repeat(x, factor, axis=axis)
    return x


def to_nxyzc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, X, C, Y, Z) -> (B, X, Y, Z, C). A metadata-only reshape when C == 1."""
    if x.shape[2] == 1:
        return x.reshape(x.shape[0], x.shape[1], *x.shape[3:], 1)
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def to_nxcyz(x: jnp.ndarray) -> jnp.ndarray:
    """(B, X, Y, Z, C) -> (B, X, C, Y, Z). A metadata-only reshape when C == 1."""
    if x.shape[-1] == 1:
        return x.reshape(x.shape[0], x.shape[1], 1, x.shape[2], x.shape[3])
    return jnp.transpose(x, (0, 1, 4, 2, 3))


class NormAct(nn.Module):
    """InstanceNorm followed by optional ReLU (resunet_model.py:23-39)."""

    act: bool = True
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        return InstanceNorm(
            act="relu" if self.act else "none",
            layout=self.layout, dtype=self.dtype, name="inorm",
        )(x)


class PreActConvBlock(nn.Module):
    """norm-act -> reflect-pad -> conv (resunet_model.py:42-66).

    ``use_bias=False`` where the conv's output feeds directly into another
    InstanceNorm: IN subtracts the per-channel mean, so a conv bias there is
    exactly cancelled — a dead parameter whose gradient is pure bf16
    round-off (the f32-trained reference keeps the same dead parameter
    pinned at ~0; dropping it is function-identical). See docs/PARITY.md.
    """

    filters: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        norm_act = NormAct(layout=self.layout, dtype=self.dtype, name="norm_act")
        p = self.kernel_size // 2
        x = norm_act(x)
        return ConvND(
            self.filters, self.kernel_size, self.strides, padding=uniform_pads(p, x),
            pad_mode="reflect", use_bias=self.use_bias, layout=self.layout,
            dtype=self.dtype, name="conv",
        )(x)


class Stem(nn.Module):
    """ResUNet stem: conv + pre-act conv block + 1x1x1-projected identity
    (resunet_model.py:69-100)."""

    filters: int
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # conv1 feeds conv_block's InstanceNorm and shortcut feeds
        # shortcut_norm directly: biases there are exactly cancelled by the
        # IN mean-subtraction (dead params; see PreActConvBlock docstring).
        conv1 = ConvND(
            self.filters, 3, 1, padding=uniform_pads(1, x), pad_mode="reflect",
            use_bias=False, layout=self.layout, dtype=self.dtype, name="conv1",
        )
        conv_block = PreActConvBlock(
            self.filters, layout=self.layout, dtype=self.dtype, name="conv_block"
        )
        shortcut_conv = ConvND(
            self.filters, 1, 1, padding="same", use_bias=False,
            layout=self.layout, dtype=self.dtype, name="shortcut",
        )
        shortcut_norm = NormAct(act=False, layout=self.layout, dtype=self.dtype,
                                name="shortcut_norm")
        conv = conv_block(conv1(x))
        shortcut = shortcut_norm(shortcut_conv(x))
        return conv + shortcut


class ResUNetResidualBlock(nn.Module):
    """Pre-activation residual block with projected shortcut
    (resunet_model.py:103-143)."""

    filters: int
    strides: int = 1
    dropout_type: str = "none"
    dropout: float = 0.0
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # block1's conv feeds block2's InstanceNorm and shortcut feeds
        # shortcut_norm directly: biases there are dead (IN-cancelled).
        do = make_dropout(self.dropout_type, self.dropout, n_spatial=x.ndim - 2,
                          layout=self.layout)
        block1 = PreActConvBlock(
            self.filters, strides=self.strides, use_bias=False,
            layout=self.layout, dtype=self.dtype, name="block1",
        )
        block2 = PreActConvBlock(
            self.filters, strides=1, layout=self.layout, dtype=self.dtype, name="block2"
        )
        shortcut_conv = ConvND(
            self.filters, 1, self.strides, padding="same", use_bias=False,
            layout=self.layout, dtype=self.dtype, name="shortcut",
        )
        shortcut_norm = NormAct(act=False, layout=self.layout, dtype=self.dtype,
                                name="shortcut_norm")
        res = block1(x)
        res = block2(res)
        shortcut = shortcut_norm(shortcut_conv(x))
        out = shortcut + res
        if do is not None:
            out = do(out, deterministic=not train)
        return out


class AttentionGate(nn.Module):
    """Oktay attention gate (vnet_model.py:24-61): additive attention on the
    skip connection."""

    n_intermediate_filters: int
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inp_1: jnp.ndarray, inp_2: jnp.ndarray) -> jnp.ndarray:
        a = ConvND(self.n_intermediate_filters, 1, 1, padding="same", layout=self.layout,
                   dtype=self.dtype, name="conv1")(inp_1)
        b = ConvND(self.n_intermediate_filters, 1, 1, padding="same", layout=self.layout,
                   dtype=self.dtype, name="conv2")(inp_2)
        f = nn.relu(a + b)
        g = ConvND(1, 1, 1, padding="same", layout=self.layout, dtype=self.dtype,
                   name="conv_out")(f)
        h = nn.sigmoid(g)
        return inp_1 * h


class AttentionConcat(nn.Module):
    """Concat upsampled features with the attention-gated skip (vnet_model.py:64-77)."""

    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, conv_below: jnp.ndarray, skip_connection: jnp.ndarray) -> jnp.ndarray:
        cax = channel_axis(self.layout)
        below_filters = conv_below.shape[cax]
        gated = AttentionGate(below_filters, layout=self.layout, dtype=self.dtype, name="gate")(
            skip_connection, conv_below
        )
        return jnp.concatenate([conv_below, gated], axis=cax)


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
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, noise_std: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # NXYZC keeps the reference order exactly (pad, then noise, then VALID
        # conv); NXCYZ folds the reflect pad into the conv (noise pre-pad —
        # see the ConvND divergence note).
        fold_pad = self.layout == "NXCYZ"
        if self.padding == "valid" and not fold_pad:
            x = reflect_pad(x, 1)
        if self.use_layer_noise:
            x = GaussianNoise(self.noise_std, name="noise")(
                x, deterministic=not train, stddev=noise_std
            )
        if self.padding == "valid":
            pad = ((1, 1),) * 3 if fold_pad else "valid"
            pad_mode = "reflect"
        else:
            pad, pad_mode = "same", "zeros"
        conv = ConvND(
            self.filters, self.kernel_size, self.strides, padding=pad, pad_mode=pad_mode,
            use_bias=False, layout=self.layout, dtype=self.dtype, name="conv",
        )
        if self.use_spec_norm:
            x = nn.SpectralNorm(conv)(x, update_stats=train)
            x = nn.leaky_relu(x, self.leaky_slope)
        else:
            x = InstanceNorm(act="leaky_relu", leaky_slope=self.leaky_slope,
                             layout=self.layout, dtype=self.dtype,
                             name="inorm")(conv(x))
        if self.use_dropout:
            x = spatial_dropout(
                self.dropout_rate, n_spatial=x.ndim - 2, name="dropout", layout=self.layout
            )(x, deterministic=not train)
        return x


class CycleGANResidualBlock(nn.Module):
    """Post-activation residual block of the ResNet generator
    (building_blocks.py:68-123): two reflect-padded 3x3x3 convs with
    InstanceNorm (he_normal gamma), identity skip."""

    dim: int
    layout: str = "NXYZC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        gamma = he_normal_1d
        conv1 = ConvND(self.dim, 3, 1, padding=uniform_pads(1, x), pad_mode="reflect",
                       use_bias=False, layout=self.layout, dtype=self.dtype, name="conv1")
        inorm1 = InstanceNorm(gamma_init=gamma, act="relu", layout=self.layout,
                              dtype=self.dtype, name="inorm1")
        conv2 = ConvND(self.dim, 3, 1, padding=uniform_pads(1, x), pad_mode="reflect",
                       use_bias=False, layout=self.layout, dtype=self.dtype, name="conv2")
        inorm2 = InstanceNorm(gamma_init=gamma, layout=self.layout, dtype=self.dtype,
                              name="inorm2")
        x = inorm1(conv1(x))
        x = inorm2(conv2(x))
        return inp + x

"""Model factory reproducing VanGan's construction configs (vangan.py:86-192)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vangan_tpu.models.discriminator import PatchGANDiscriminator3D
from vangan_tpu.models.resnet_generator import ResNetGenerator3D
from vangan_tpu.models.resunet import ResUNet3D
from vangan_tpu.models.vnet import VNet3D


def _dtype_of(cfg) -> Any:
    name = getattr(cfg, "compute_dtype", "float32")
    return jnp.bfloat16 if name in ("bfloat16", "bf16") else jnp.float32


def _layout_of(cfg) -> str:
    """Model layout: the NXCYZ Pallas layout engine is 3-D only, so
    DIMENSIONS=2 configs always build channels-last models (the rank itself
    is inferred from the input tensors — see models.layers.ConvND)."""
    if getattr(cfg, "DIMENSIONS", 3) == 2:
        return "NXYZC"
    return getattr(cfg, "layout", "NXYZC")


def build_generator(kind: str, cfg, role: str = "i2s") -> nn.Module:
    """Build a generator. ``role`` is 'i2s' (imaging->segmentation) or 's2i'.

    Configurations mirror vangan.py:88-164 exactly (incl. the per-role V-Net
    differences: the s2i V-Net uses batch norm, deconv upsampling and 16
    filters; the i2s V-Net instance norm, nearest upsampling and 32 filters).
    """
    dtype = _dtype_of(cfg)
    f = getattr(cfg, "gen_filters", 16)
    layout = _layout_of(cfg)
    if kind == "resnet":
        return ResNetGenerator3D(
            filters=2 * f, num_downsampling_blocks=3, num_residual_blocks=6,
            num_upsample_blocks=3, layout=layout, dtype=dtype,
        )
    if kind == "vnet":
        if role == "i2s":
            return VNet3D(
                use_batch_norm=False, upsample_mode="simple", dropout=0.5,
                dropout_change_per_layer=0.0, dropout_type="spatial",
                use_dropout_on_upsampling=False, use_attention_gate=False, filters=2 * f,
                num_layers=4, output_activation="tanh", layout=layout, dtype=dtype,
            )
        return VNet3D(
            use_batch_norm=True, upsample_mode="deconv", dropout=0.5,
            dropout_change_per_layer=0.0, dropout_type="spatial",
            use_dropout_on_upsampling=False, use_attention_gate=False, filters=f,
            num_layers=4, output_activation="tanh", addnoise=False, layout=layout, dtype=dtype,
        )
    if kind == "resUnet":
        return ResUNet3D(
            upsample_mode="simple", dropout=0.1, dropout_change_per_layer=0.1,
            dropout_type="none", use_attention_gate=False, filters=f, num_layers=4,
            output_activation="tanh", use_input_noise=False, layout=layout, dtype=dtype,
        )
    raise ValueError(f"Generator type not recognised: {kind!r}")


def build_discriminator(cfg) -> PatchGANDiscriminator3D:
    """PatchGAN discriminator with the VanGan defaults (vangan.py:167-192)."""
    return PatchGANDiscriminator3D(
        filters=getattr(cfg, "disc_filters", 64),
        use_dropout=True,
        dropout_rate=0.2,
        wasserstein=getattr(cfg, "wasserstein", False),
        use_SN=False,
        use_input_noise=True,
        use_layer_noise=True,
        noise_std=getattr(cfg, "layer_noise", 0.1),
        layout=_layout_of(cfg),
        dtype=_dtype_of(cfg),
    )

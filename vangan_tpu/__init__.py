"""VAN-GAN-TPU: a TPU-native (JAX/XLA/Pallas) 3D image-to-image translation framework.

A from-scratch rebuild of the capabilities of psweens/VAN-GAN (unsupervised 3D
vascular-network segmentation via CycleGAN with topology-preserving clDice loss),
designed TPU-first:

- models are flax modules lowered through XLA (MXU-tiled 3D convs, bf16 compute),
- the CycleGAN train step is ONE jit-compiled program: a single shared forward and
  a single combined backward computing all four networks' gradients exactly
  (vs the reference's persistent GradientTape + 4 backward passes,
  /root/reference/vangan.py:380-440),
- data parallelism is a 1-D ``jax.sharding.Mesh`` with XLA-inserted collectives,
- the clDice soft-skeleton and sliding-window stitcher hot paths have fused
  Pallas kernels.

Reference behaviours are cited in docstrings as ``reference-file.py:line``.
"""

__version__ = "0.1.0"

from vangan_tpu.config import VanGanConfig, save_args  # noqa: F401

"""MorphGANformer-TPU: a TPU-native (JAX/XLA/Pallas) face morphing / de-morphing framework.

A ground-up rebuild of the capabilities of the MorphGANformer reference
(GANformer generator + latent projection + morphing + metrics + training),
designed TPU-first:

- NHWC layouts, bfloat16-friendly compute, everything jit-compiled.
- FIR resampling / modulated convolution expressed as XLA `lax.conv_general_dilated`
  (base-dilated convs) instead of custom CUDA kernels.
- Demodulation as activation scaling (never per-sample grouped conv).
- Latent projection is a single jitted `lax.fori_loop` with true end-to-end
  gradients through the generator (the reference's projection severs the graph).
- Data parallelism via `jax.sharding.Mesh` + collectives, not DDP/NCCL.
"""

__version__ = "0.1.0"

from morphganformer_tpu.models.config import GANformerConfig  # noqa: F401

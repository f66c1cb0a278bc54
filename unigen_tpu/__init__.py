"""unigen_tpu — a TPU-native universal controllable image generation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
UniGen system (gavin-gqzhang/UniGen: "Condition Weaving Meets Expert Modulation:
Towards Universal and Controllable Image Generation"): a trainable
condition-weaving control branch + MoE expert-modulation module over a frozen
pretrained MMDiT backbone (FLUX.1 / SD3.5 / SANA), supporting twelve spatial
condition types, single- and multi-condition joint control, trained with flow
matching.

Design stance (NOT a port):
  * functional core — parameters are pytrees, models are pure apply functions
  * one jit-compiled program per pipeline; denoise loop via lax.scan
  * block stacks applied with lax.scan over stacked params (fast compiles)
  * mesh axes (data, model, expert, sequence) with jax.sharding/pjit; XLA
    collectives over ICI replace the reference's NCCL/DeepSpeed machinery
  * Pallas kernels for the joint-attention hot path, XLA fallback everywhere
"""

__version__ = "0.1.0"

from unigen_tpu import config as config  # noqa: F401

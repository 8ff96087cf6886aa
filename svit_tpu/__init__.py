"""svit_tpu: TPU-native video-transformer framework with SViT capabilities.

A ground-up JAX/XLA/Pallas re-design of the capabilities of eladb3/SViT
(PySlowFast-based PyTorch reference): MViTv2 multiscale video transformer with
per-frame object tokens, joint video/image (HAOG) training, multi-view SSv2
evaluation, checkpoint conversion from released PyTorch weights, and a
pjit/mesh distributed runtime.
"""

__version__ = "0.1.0"

"""lfb_tpu: a TPU-native (JAX/XLA/Pallas) framework for Long-Term Feature Bank
video understanding, with the full capability surface of
facebookresearch/video-long-term-feature-banks.

The reference codebase (CVPR'19 "Long-Term Feature Banks for Detailed Video
Understanding") is a Caffe2 graph-mode GPU trainer; this package is a ground-up
TPU-first redesign:

  * 3D-CNN backbones (R50/R101, C2D/I3D) built as pure-pytree functional
    models jitted end-to-end by XLA (``lfb_tpu.models``).
  * Space-time non-local attention and the feature-bank operator (FBO) as
    fused attention kernels (``lfb_tpu.ops``), with Pallas TPU kernels for
    the hot paths.
  * Data parallelism over a ``jax.sharding.Mesh`` (ICI collectives via pjit)
    instead of NCCL (``lfb_tpu.parallel``).
  * An HBM-resident long-term feature bank with on-device window gather
    (``lfb_tpu.bank``).
  * Caffe2-pickle-compatible checkpoint I/O (2D->3D inflation, BN->affine
    folding) so released reference weights load directly
    (``lfb_tpu.train.checkpoints``).
"""

__version__ = "0.1.0"

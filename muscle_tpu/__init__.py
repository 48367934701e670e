"""muscle_tpu — a TPU-native JAX framework for multi-strategy contrastive
weakly-supervised semantic segmentation (capability parity with SCoulY/MuSCLe).

The reference pipeline (PyTorch, single GPU) is a five-stage offline pipeline:
MCL classifier training -> CAM generation -> IRN random-walk refinement ->
segmentation training on pseudo-labels -> TTA segmentation inference + CRF.

This package re-designs every stage TPU-first:

* all dense compute is JAX/XLA (NHWC layout, bfloat16-friendly, static shapes),
* batched multi-scale TTA replaces per-image python loops,
* the HW x HW random-walk power iteration is a blocked Pallas matmul kernel,
* dense-CRF post-processing is mean-field message passing in XLA,
* training/inference run under a `jax.sharding.Mesh` (data-parallel by
  default) so the same code scales from 1 chip to a full slice over ICI.

Subpackages
-----------
core        pure-function numeric substrate (CAM normalisers, resize, sobel)
models      Flax modules: EfficientNet, BiFPN, MuSCLe, ResNet-50, IRN
ops         random walk, sinkhorn, CRF, Pallas kernels
losses      focal/LSEP/soft-margin, IMC, PixPro, EMD, BEACON field loss
data        VOC12 host input pipeline + batched TTA producers
parallel    mesh construction and sharding helpers
training    train states, schedules, MCL and segmentation train steps
inference   CAM / random-walk / segmentation inference drivers
evaluation  vectorised mIoU with threshold sweep
convert     PyTorch .pth checkpoint -> Flax parameter converter
"""

__version__ = "0.1.0"

from muscle_tpu.core import cam_maxnorm, cam_maxnorm_with_bg, cam_softmaxnorm

"""mega_pytorch_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video object detection framework.

A from-scratch rebuild of the capabilities of Scalsol/mega.pytorch (MEGA, CVPR 2020):
a Faster R-CNN (ResNet-C4) detector core plus five video detection methods on
ImageNet VID — base (single frame), DFF, FGFA, RDN, and MEGA.

Design stance (TPU-first, not a port):
  * pure functional models (flax.linen) over pytree params — no mutable modules
  * fixed-shape padded boxes + validity masks instead of ragged BoxLists
  * `lax.scan` streaming state instead of Python deques at inference
  * mesh-sharded batches via `jax.sharding` / pjit instead of DDP/NCCL
  * Pallas/XLA kernels instead of CUDA extensions (ROIAlign, NMS, warp)
"""

__version__ = "0.1.0"

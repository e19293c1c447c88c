"""instancesegmentation_tpu — a TPU-native (JAX/XLA/Pallas/pjit) instance
segmentation framework.

Re-designed from scratch with the capability surface of the reference
PyTorch framework (Leyan529/InstanceSegmentation-): two model families
(YOLACT, Mask R-CNN), COCO-format data pipelines (VOC / COCO / VerSeg),
a two-phase freeze/unfreeze trainer with EMA + early stopping + cosine
schedules, COCO mAP evaluation, image/video/FPS prediction, and StableHLO
export — all built TPU-first:

- static shapes everywhere (padded instances + validity masks)
- NHWC layouts, bf16 compute / f32 params
- data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` (no NCCL)
- Pallas kernels for the hot custom ops (RoIAlign)
- host-side data/eval code kept off the device path
"""

__version__ = "0.1.0"

"""TPU-native multispectral (RGB + thermal-IR) object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
DocF/multispectral-object-detection (CFT, arXiv:2111.00273):

- YAML model-graph DSL: single-stream YOLOv5 s/m/l/x and two-stream
  add/CFT-fusion variants (reference: models/yolo_test.py:479 parse_model).
- Dual CSPDarknet backbones + GPT-style cross-modality fusion transformer
  at three pyramid scales + PANet neck + anchor Detect head
  (reference: models/common.py:549 GPT, models/yolo_test.py:25 Detect).
- Fixed-shape, fully-jittable training objective (CIoU + obj/cls BCE with
  masked target assignment; reference: utils/loss.py:88).
- On-device batched NMS and detection decode (reference: utils/general.py:455).
- Paired RGB/IR data pipeline with mosaic/affine/HSV/flip augmentation
  (reference: utils/datasets.py:820).
- pjit/shard_map data + model parallelism over a jax.sharding.Mesh instead of
  NCCL DDP (reference: train.py:989-995).

Everything here is a fresh TPU-first design: NHWC layouts, static shapes,
masking instead of boolean indexing, functional state, bf16 compute.
"""

__version__ = "0.1.0"

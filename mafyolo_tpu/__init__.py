"""MAF-YOLO-TPU: a TPU-native JAX/XLA/Pallas rebuild of the MAF-YOLO detection framework.

Capability parity target: yang-0201/MAF-YOLO (PRCV 2024, arXiv:2407.04381), whose
structure is mapped in /root/repo/SURVEY.md. This package is a from-scratch design:
NHWC tensors, pure-functional models (flax.linen param pytrees), one jit-compiled
train step sharded over a `jax.sharding.Mesh`, fixed-shape label assignment and NMS
(no CPU fallbacks), and re-parameterization expressed as pure pytree->pytree folds.
"""

__version__ = "0.1.0"

"""bayesian_yolov3_tpu — TPU-native Bayesian YOLOv3 (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of flkraus/bayesian-yolov3
(YOLOv3 object detection with aleatoric + epistemic MC-dropout uncertainty,
ITSC 2019, arXiv:1905.10296) designed TPU-first:

* functional parameter pytrees instead of a TF-1.x graph builder,
* MC-dropout as a ``vmap`` over an explicit sample axis with on-chip PRNG
  (instead of batch-stacking feature maps),
* fixed-shape on-device anchor decode + class-agnostic NMS,
* ``jax.sharding`` meshes for data-parallel training and MC-sample-parallel
  inference (the reference is single-GPU only).

Subpackages
-----------
core      priors, box math, model blueprints (shape contracts)
ops       conv/BN/dropout blocks, anchor decode, entropy/MI, NMS, Pallas kernels
models    Darknet-53 backbone + the three YOLOv3 variants
data      tfrecord IO, augmentation, cropping, vectorized GT encoding
parallel  device meshes, sharded train/inference steps
train     training driver, checkpoints, metrics
infer     inference runners, ECP JSON output, detect demo, uncertainty vis
"""

__version__ = "0.1.0"

"""cp360_tpu — TPU-native framework for weakly-supervised 360° video saliency.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hsientzucheng/CP-360-Weakly-Supervised-Saliency (CVPR'18 "Cube Padding for
Weakly-Supervised Saliency Prediction in 360° Videos"):

- equirectangular <-> cubemap projection as precomputed gather resamplers
  (reference: utils/equi_to_cube.py, utils/cube_to_equi.py)
- cube padding as a single precomputed-index gather op
  (reference: model/cube_pad.py)
- cube-padded ResNet family + Class Activation Mapping head
  (reference: model/resnet_cubic.py, static_model/class_activation_model.py)
- cube-padded ConvLSTM temporal model as a lax.scan
  (reference: model/clstm.py)
- weakly-supervised training losses (flow-warp / temporal / motion-mask MSE)
  (reference: temporal_model/train_temporal.py)
- bit-faithful saliency metrics (AUC-Judd / AUC-Borji / CC / SIM)
  (reference: utils/eval_saliency.py)
- SPMD scale-out over jax.sharding.Mesh (data / model axes) — new, the
  reference is single-GPU only.

Design: all device math is functional JAX (jit/scan/vmap/shard_map); all
projection maps are precomputed once per resolution on the host and baked
into the compiled graph as gather indices + bilinear weights.
"""

__version__ = "0.1.0"

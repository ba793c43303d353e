from cp360_tpu.models.resnet import ARCHS, init_resnet_params, resnet_apply
from cp360_tpu.models.cam import cam_forward, cam_scores, shift_weight_nonneg
from cp360_tpu.models.clstm import clstm_rollout, clstm_step, init_clstm_params
from cp360_tpu.models.mobilenet import (  # noqa: F401
    convert_mobilenet_v2,
    init_mobilenet_v2_params,
    mobilenet_v2_apply,
    mobilenet_v2_cam_forward,
)

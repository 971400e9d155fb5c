from .config import SamConfig
from .decoder import encode_box_prompt, encode_mask_prompt, encode_point_prompt, encode_prompts
from .sam import (
    init_sam_params,
    sam_forward,
    sam_forward_prompted,
    instance_sam_forward,
    InstanceSamOutput,
)
from .loss import DiceFocalLoss, InstanceSamLoss

__all__ = [
    "SamConfig",
    "init_sam_params",
    "sam_forward",
    "sam_forward_prompted",
    "instance_sam_forward",
    "InstanceSamOutput",
    "DiceFocalLoss",
    "InstanceSamLoss",
    "encode_point_prompt",
    "encode_box_prompt",
    "encode_mask_prompt",
    "encode_prompts",
]

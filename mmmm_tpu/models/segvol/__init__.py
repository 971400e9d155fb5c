from .config import SamConfig
from .sam import init_sam_params, sam_forward, instance_sam_forward, InstanceSamOutput
from .loss import DiceFocalLoss, InstanceSamLoss

__all__ = [
    "SamConfig",
    "init_sam_params",
    "sam_forward",
    "instance_sam_forward",
    "InstanceSamOutput",
    "DiceFocalLoss",
    "InstanceSamLoss",
]

from .config import CogVLMConfig, VisionConfig
from .vit import init_vit_params, vit_forward
from .decoder import init_llm_params, llm_forward
from .model import init_cogvlm_params, cogvlm_forward, weighted_ce_loss

__all__ = [
    "CogVLMConfig",
    "VisionConfig",
    "init_vit_params",
    "vit_forward",
    "init_llm_params",
    "llm_forward",
    "init_cogvlm_params",
    "cogvlm_forward",
    "weighted_ce_loss",
]

from . import cogvlm, segvol
from .mmmm import MMMMConfig, MMMMModel, init_mmmm_params

__all__ = ["cogvlm", "segvol", "MMMMConfig", "MMMMModel", "init_mmmm_params"]

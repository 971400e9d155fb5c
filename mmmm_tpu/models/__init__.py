from . import cogvlm

__all__ = ["cogvlm"]

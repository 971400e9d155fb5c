from .defs import CE_IGNORE_INDEX, ConvTurn, LANGUAGE_TOKEN_TYPE, VISION_TOKEN_TYPE
from .tokenizer import MMMMTokenizer
from .input_builder import prepare_vlm_inputs

__all__ = [
    "CE_IGNORE_INDEX",
    "ConvTurn",
    "LANGUAGE_TOKEN_TYPE",
    "VISION_TOKEN_TYPE",
    "MMMMTokenizer",
    "prepare_vlm_inputs",
]

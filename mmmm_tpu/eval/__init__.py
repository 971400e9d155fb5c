from .metrics import GenericMetrics, bleu, rouge_l, rouge_n, meteor, exact_match
from .cxr import CXRMetrics, KeywordChexpertLabeler, CHEXPERT_CONDITIONS

__all__ = [
    "GenericMetrics",
    "bleu",
    "rouge_l",
    "rouge_n",
    "meteor",
    "exact_match",
    "CXRMetrics",
    "KeywordChexpertLabeler",
    "CHEXPERT_CONDITIONS",
]

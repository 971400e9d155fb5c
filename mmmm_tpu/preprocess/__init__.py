from .nifti import read_nifti, write_nifti, NiftiImage
from .processor import Processor, ProcessorConfig, CaseSpec

__all__ = [
    "read_nifti",
    "write_nifti",
    "NiftiImage",
    "Processor",
    "ProcessorConfig",
    "CaseSpec",
]

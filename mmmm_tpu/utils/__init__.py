from .io import load_pt_zst, save_pt_zst, load_array_zst, save_array_zst

__all__ = ["load_pt_zst", "save_pt_zst", "load_array_zst", "save_array_zst"]

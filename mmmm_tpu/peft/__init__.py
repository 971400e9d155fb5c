from .lora import LoraConfig, lora_init, lora_merge, default_lora_targets, split_trainable, merge_trainable

__all__ = [
    "LoraConfig",
    "lora_init",
    "lora_merge",
    "default_lora_targets",
    "split_trainable",
    "merge_trainable",
]

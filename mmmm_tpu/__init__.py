"""MMMM-TPU: a TPU-native medical vision-language grounding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
function2-llx/MMMM (VividMed, NAACL 2025): 2-D X-ray / 3-D CT-MRI images in,
text (VQA answers / radiology reports) out, with promptable visual grounding
(semantic masks via a SAM head, instance boxes via an instance-SAM head).

Layer map (bottom-up):
  - ``mmmm_tpu.ops``      Pallas/XLA kernels: segment-id flash attention,
                          variable-depth patch embedding, resampling, RoPE,
                          fixed-size Hungarian matching.
  - ``mmmm_tpu.models``   CogVLM (EVA ViT + visual-expert decoder), SegVol
                          SAM / InstanceSam grounding heads, MMMM fusion.
  - ``mmmm_tpu.data``     tokenizer, conversation -> packed VLM inputs,
                          sparse metadata schema, transforms, sampling.
  - ``mmmm_tpu.parallel`` mesh construction + sharding rules (dp/tp/fsdp).
  - ``mmmm_tpu.peft``     LoRA as a parameter-tree transform.
  - ``mmmm_tpu.train``    optimizer, train step, checkpointing, weight import.
"""

__version__ = "0.1.0"

"""Batched text-only generation harness test."""
import jax

from mmmm_tpu.data import MMMMTokenizer
from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.llm_batch import make_text_generator


def test_batch_generate_text():
    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok)).vlm
    params = MMMMModel(MMMMConfig.tiny(vocab_size=len(tok))).init(jax.random.PRNGKey(0))["cogvlm"]
    gen = make_text_generator(params, cfg, tok, max_new_tokens=6, batch_size=2, attn_impl="xla")
    prompts = ["short", "a much longer prompt with more text", "mid size one"]
    outs = gen(prompts)
    assert len(outs) == 3
    assert all(isinstance(o, str) for o in outs)
    # deterministic: same prompt -> same continuation regardless of batch mix
    outs2 = gen([prompts[0]])
    assert outs2[0] == outs[0]


def test_continuous_flag_matches_static():
    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok)).vlm
    params = MMMMModel(MMMMConfig.tiny(vocab_size=len(tok))).init(jax.random.PRNGKey(0))["cogvlm"]
    prompts = ["short", "a much longer prompt with more text", "mid size one"]
    kw = dict(max_new_tokens=5, batch_size=2, seq_quant=16, attn_impl="xla")
    static = make_text_generator(params, cfg, tok, **kw)(prompts)
    cont = make_text_generator(params, cfg, tok, continuous=True, **kw)(prompts)
    assert cont == static

"""Continuous batching: slot-pool greedy serving == static batched generation."""
import jax
import jax.numpy as jnp
import numpy as np

from mmmm_tpu.data import MMMMTokenizer
from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.llm_batch import make_text_generator
from mmmm_tpu.models.serving import TextServer


def _setup():
    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok)).vlm
    params = MMMMModel(MMMMConfig.tiny(vocab_size=len(tok))).init(
        jax.random.PRNGKey(0)
    )["cogvlm"]
    return tok, cfg, params


def test_continuous_batching_matches_static():
    """Each prompt's completion is independent of slot assignment, refill
    timing, and pool neighbors — identical to the static llm_batch path."""
    tok, cfg, params = _setup()
    prompts = [
        "a", "the quick brown fox", "mid", "another prompt here",
        "yet another much longer prompt for the pool", "zz", "last one",
    ]
    static = make_text_generator(
        params, cfg, tok, max_new_tokens=6, batch_size=2, attn_impl="xla"
    )(prompts)
    server = TextServer(
        params, cfg, tok, n_slots=2, max_new_tokens=6, chunk=3,
        seq_quant=16, max_prompt_len=64, attn_impl="xla",
    )
    served = server.generate(prompts)
    assert served == static


def test_server_refills_mid_flight():
    """Finished slots are refilled while neighbors are still mid-request (the
    continuous-batching property), and the chunk count is near the ideal
    total_tokens / (slots * chunk) floor rather than a wait-for-all schedule."""
    tok, cfg, params = _setup()
    prompts = ["one", "two", "three", "four", "five", "six"]
    # staggered per-request budgets: short requests free their slot while the
    # long ones are still decoding
    budgets = [2, 8, 2, 2, 8, 2]
    server = TextServer(
        params, cfg, tok, n_slots=2, max_new_tokens=8, chunk=2,
        seq_quant=16, max_prompt_len=64, attn_impl="xla",
    )
    outs = server.generate(prompts, max_new=budgets)
    assert all(isinstance(o, str) for o in outs) and len(outs) == 6
    assert [len(tok.encode(o)) <= b for o, b in zip(outs, budgets)]
    assert server.stats["refills"] >= 3
    assert server.stats["refilled_mid_flight"] >= 1
    # 24 total tokens / (2 slots x 2/chunk) = 6 ideal chunks; allow bubbles
    assert server.stats["chunks"] <= 12

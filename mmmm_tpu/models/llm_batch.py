"""Batched text-only generation: the offline-LLM-job harness.

The reference shells out to vLLM for its offline LLM workloads (report
cleaning, phrase tagging, judge scoring — ``scripts/data/vg/tag.py:355-359``,
``scripts/evaluate/utils.py:206``). The TPU equivalent runs any CogVLM-family
LM (text-only path: no image splice) through the same jitted prefill+decode
used for serving, with right-padded prompt buckets. The returned callable
matches the ``generate_fn`` interface of ``eval.judge.LLMJudge`` and the
``Tagger`` hooks.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data.defs import LANGUAGE_TOKEN_TYPE
from ..data.tokenizer import MMMMTokenizer
from .cogvlm import CogVLMConfig
from .generate import greedy_generate


def make_text_generator(
    params: dict,
    cfg: CogVLMConfig,
    tokenizer: MMMMTokenizer,
    *,
    max_new_tokens: int = 256,
    batch_size: int = 16,
    seq_quant: int = 128,
    attn_impl: str = "auto",
    continuous: bool = False,
    max_prompt_len: int = 1024,
    speculate: int = 0,
):
    """Returns ``generate(prompts: list[str]) -> list[str]``.

    ``continuous=True`` serves through the slot-pool scheduler
    (``serving.TextServer``): finished sequences are replaced mid-flight, so
    jobs with varied completion lengths (tagging's early "no findings" exits,
    judge single-token replies) pay mean length, not max — the property the
    reference gets from vLLM's continuous batching. Outputs are identical to
    the static path (greedy, slot-independent). The server also prefix-caches
    the job's shared instruction template automatically, and ``speculate=k``
    adds k-token n-gram lookahead per decode step (templated medical reports
    accept drafts often; still token-identical to greedy)."""
    if continuous:
        from .serving import TextServer

        server = TextServer(
            params, cfg, tokenizer, n_slots=batch_size,
            max_new_tokens=max_new_tokens, seq_quant=seq_quant,
            max_prompt_len=max_prompt_len, attn_impl=attn_impl,
            speculate=speculate,
        )
        return server.generate

    def generate(prompts):
        outputs: list[str] = [""] * len(prompts)
        order = sorted(range(len(prompts)), key=lambda i: len(prompts[i]))
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            encoded = [
                [tokenizer.bos_token_id] + tokenizer.encode(prompts[i]) for i in idxs
            ]
            max_len = max(len(e) for e in encoded)
            bucket = -(-max_len // seq_quant) * seq_quant
            b = len(encoded)
            ids = np.zeros((b, bucket), np.int32)
            pos = np.zeros((b, bucket), np.int32)
            lens = np.zeros(b, np.int32)
            for row, e in enumerate(encoded):
                ids[row, : len(e)] = e
                pos[row, : len(e)] = np.arange(len(e))
                lens[row] = len(e)
            res = greedy_generate(
                params,
                cfg,
                jnp.asarray(ids),
                jnp.full((b, bucket), LANGUAGE_TOKEN_TYPE, jnp.int32),
                jnp.asarray(pos),
                jnp.asarray(lens),
                max_new_tokens=max_new_tokens,
                eos_token_id=tokenizer.eos_token_id,
                bop_token_id=tokenizer.bop_token_id,
                eop_token_id=tokenizer.eop_token_id,
                attn_impl=attn_impl,
            )
            tokens = np.asarray(res.tokens)
            for row, i in enumerate(idxs):
                outputs[i] = tokenizer.decode(
                    [int(t) for t in tokens[row] if int(t) != tokenizer.eos_token_id]
                )
        return outputs

    return generate

"""N-gram speculative decoding: draft-free lookahead for the decode loop.

Single-chip decode is weight-read-bound (measured round 3: ~7.2 ms/step at
B16 ≈ the 3.3 GB int8-weight + cache read roofline), so the only way past it
is to commit MORE THAN ONE token per weight pass. This module drafts k-1
continuation tokens by n-gram lookup over the request's own token history
(prompt + generated so far — radiology reports are highly templated and
self-repetitive), then verifies the whole window in ONE ``llm_decode_step``:
the k-token window reads exactly the same weights as a single-token step, so
the per-step cost is ~1 decode step + k× the (small) cache-attention term,
while the committed tokens per step equal 1 + the accepted-draft count.

Greedy verification keeps only the draft prefix that matches the model's own
fp32 argmax at every position, plus the model's next token after the last
accepted draft — the output is therefore **token-identical to greedy
decoding** (``tests/test_speculative.py`` asserts this), including the
CogVLM <p>/</p> position-freeze quirk (positions inside the verify window are
computed with the same rule the greedy loop applies per step,
``mmmm/models/mmmm.py:383-388``) and eos/num_generated semantics.

This is a beyond-reference serving capability (the reference decodes one
token per forward, ``modeling_cogvlm.py:725-780``); the technique is public
"prompt lookup decoding" adapted to static-shape TPU serving: the history
scan, draft gather, window verify, and variable-length commits all run
on-device inside one ``lax.while_loop`` — no host round-trips (the axon
relay costs ~45 ms per dispatch), no dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quant import qdot
from .cogvlm import CogVLMConfig
from .cogvlm.decoder import llm_decode_step
from .generate import GenerateResult, chunked_prefill_decode_state


def ngram_draft(
    hist: jnp.ndarray,  # (B, L) int32 token history, valid up to hist_len
    hist_len: jnp.ndarray,  # (B,) valid length; hist[b, hist_len[b]-1] is the newest token
    *,
    n_draft: int,
    ngram: int = 2,
) -> jnp.ndarray:
    """Propose ``n_draft`` continuation tokens after the end of ``hist``.

    Finds the most recent earlier occurrence of the trailing ``ngram`` tokens
    and copies the ``n_draft`` tokens that followed it. Positions past the
    valid region (match too close to the end) and the no-match case fall back
    to repeating the newest token — drafts only need to be *guesses*; the
    verify step rejects bad ones at zero extra weight-read cost.

    Pure function of (hist, hist_len); fully vectorized over the batch — the
    scan is B×L integer compares, noise next to a decode step.
    """
    b, L = hist.shape
    idx = jnp.arange(L)
    ok = jnp.ones((b, L), bool)
    for j in range(ngram):
        ctx_j = jnp.take_along_axis(
            hist, jnp.maximum(hist_len - ngram + j, 0)[:, None], axis=1
        )  # (B, 1) j-th token of the trailing n-gram
        # hist[p + j] for every candidate start p (roll wrap-around is masked
        # below: candidates are capped at hist_len - 1 - ngram < L - j)
        ok &= jnp.roll(hist, -j, axis=1) == ctx_j
    # exclude the trailing occurrence itself and anything past the valid region
    ok &= (idx[None, :] + ngram) <= (hist_len[:, None] - 1)
    found = ok.any(axis=1)
    p_best = jnp.argmax(jnp.where(ok, idx[None, :], -1), axis=1)  # last match
    start = p_best + ngram  # first continuation token of the match
    gather = jnp.clip(start[:, None] + jnp.arange(n_draft)[None, :], 0, L - 1)
    drafts = jnp.take_along_axis(hist, gather, axis=1)  # (B, n_draft)
    newest = jnp.take_along_axis(hist, (hist_len - 1)[:, None], axis=1)
    valid = found[:, None] & (gather < hist_len[:, None])
    return jnp.where(valid, drafts, newest)


def ngram_speculative_generate(
    params: dict,
    cfg: CogVLMConfig,
    input_ids: jnp.ndarray,  # (B, S_prompt) right-padded prompt
    token_type_ids: jnp.ndarray,  # (B, S_prompt)
    position_ids: jnp.ndarray,  # (B, S_prompt)
    prompt_len: jnp.ndarray,  # (B,) true prompt lengths
    *,
    max_new_tokens: int,
    eos_token_id: int,
    bop_token_id: int,
    eop_token_id: int,
    image: jnp.ndarray | None = None,
    patch_size=None,
    pool_size=None,
    attn_impl: str = "auto",
    vis_span: tuple[int, int] | None = None,
    kv_cache_dtype: str = "bf16",
    draft_len: int = 7,
    ngram: int = 2,
    return_stats: bool = False,
    prefill_chunk: int = 0,
    chunk_mode: str = "all",
) -> GenerateResult:
    """Drop-in replacement for ``greedy_generate`` with n-gram speculation.

    Token-identical output (tokens, num_generated, and the hidden states for
    every generated token — grounded SAM prompting gathers from these, so
    they must match too). ``draft_len`` drafts per step ⇒ a verify window of
    ``k = draft_len + 1`` tokens; per-row commits per step ∈ [1, k].

    ``return_stats=True`` additionally returns ``{"iters": verify steps run,
    "tokens_per_step": mean committed tokens per step}`` — the speculative
    speedup gauge (greedy ≡ 1.0).

    ``prefill_chunk > 0`` prefills in batch sub-chunks (in-program lax.map,
    see ``generate.chunked_prefill_decode_state``) — the spec path was
    otherwise capped at the unchunked prefill-transient batch ceiling, where
    speculation matters least (large batches amortize weight reads but NOT
    the per-committed-token cache reads a verify window skips).
    """
    k = draft_len + 1
    b, s_prompt = input_ids.shape
    c = params["llm"]["embed_tokens"].shape[1]
    # k-1 slack slots: every verify step writes a full k-wide window into the
    # cache / output buffers even when only n of it commits; rejected slots
    # are overwritten by the next window (its start advances by n ≤ k) and
    # are never attended (kv_len masks) nor returned (eos masking below)
    smax = s_prompt + max_new_tokens + k

    state0, prefill_hidden, last_hidden = chunked_prefill_decode_state(
        params, cfg, input_ids, token_type_ids, position_ids, prompt_len,
        chunk=prefill_chunk, chunk_mode=chunk_mode, slice_to_batch=True,
        smax=smax, eos_token_id=eos_token_id,
        image=image, patch_size=patch_size, pool_size=pool_size,
        attn_impl=attn_impl, vis_span=vis_span, kv_cache_dtype=kv_cache_dtype,
    )

    upd_row = jax.vmap(lambda a, u, i: jax.lax.dynamic_update_slice_in_dim(a, u, i, axis=0))
    hist = jnp.zeros((b, smax), jnp.int32).at[:, :s_prompt].set(input_ids)
    hist = upd_row(hist, state0["tok"][:, None], prompt_len)  # newest = tok to feed

    state = {
        **state0,
        "hist": hist,
        "hist_len": prompt_len + 1,
        "h_prev": last_hidden,  # hidden state that produced state["tok"]
        "out_tokens": jnp.full((b, max_new_tokens + k), eos_token_id, jnp.int32),
        "out_hidden": jnp.zeros((b, max_new_tokens + k, c), last_hidden.dtype),
        "emitted": jnp.zeros((b,), prompt_len.dtype),
        "iters": jnp.zeros((), jnp.int32),
    }

    j_idx = jnp.arange(k)[None, :]

    def cond(st):
        active = (~st["done"]) & (st["emitted"] < max_new_tokens)
        return jnp.any(active) & (st["iters"] < max_new_tokens)

    def body(st):
        active = (~st["done"]) & (st["emitted"] < max_new_tokens)
        drafts = ngram_draft(st["hist"], st["hist_len"], n_draft=draft_len, ngram=ngram)
        window = jnp.concatenate([st["tok"][:, None], drafts], axis=1)  # (B, k)

        # <p>/</p> position freeze, applied across the window: the position of
        # fed token j does not advance when its predecessor is <p> or it is
        # itself </p> (same rule the greedy loop applies one step at a time)
        prevs = jnp.concatenate([st["prev_tok"][:, None], window[:, :-1]], axis=1)
        keep = (prevs == bop_token_id) | (window == eop_token_id)
        pos_w = st["pos"][:, None] + jnp.cumsum(1 - keep.astype(st["pos"].dtype), axis=1)

        emb = params["llm"]["embed_tokens"][window]  # (B, k, C)
        kv_len = st["write"][:, None] + jnp.arange(1, k + 1)[None, :]  # (B, k)
        hidden_w, caches = llm_decode_step(
            params["llm"], cfg, emb, None, pos_w, st["caches"],
            st["write"], kv_len, attn_impl=attn_impl,
        )
        logits = qdot(hidden_w, params["llm"]["lm_head"]).astype(jnp.float32)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k) greedy successors

        # accept the longest draft prefix matching the model's own argmax
        match = (window[:, 1:] == g[:, :-1]).astype(jnp.int32)  # (B, k-1)
        a = jnp.cumprod(match, axis=1).sum(axis=1)  # last fed index ∈ [0, k-1]
        # commit window[j] while j ≤ a and no eos among window[:j+1] (greedy
        # emits eos only as padding; num_generated counts pre-eos tokens)
        noneos = jnp.cumprod((window != eos_token_id).astype(jnp.int32), axis=1)
        commit = (j_idx <= a[:, None]) & (noneos == 1)
        n_raw = commit.sum(axis=1)
        room = jnp.maximum(max_new_tokens - st["emitted"], 0)
        n = jnp.where(active, jnp.minimum(n_raw, room), 0)
        eos_hit = jnp.take_along_axis(noneos, a[:, None], axis=1)[:, 0] == 0

        last = jnp.maximum(n - 1, 0)[:, None]  # index of the last committed token
        take_tok = lambda arr: jnp.take_along_axis(arr, last, axis=1)[:, 0]
        nxt = take_tok(g)  # the model's own token after the last committed one
        # done when an accepted draft hit eos, or the next token IS eos (greedy
        # never emits eos as content; num_generated counts pre-eos tokens only)
        done_new = st["done"] | (
            active & ((eos_hit & (n == n_raw)) | (nxt == eos_token_id))
        )
        tok_new = jnp.where(active, jnp.where(done_new, eos_token_id, nxt), st["tok"])
        prev_new = jnp.where(active, take_tok(window), st["prev_tok"])
        pos_new = jnp.where(active, take_tok(pos_w), st["pos"])
        h_new = jnp.where(
            active[:, None],
            jnp.take_along_axis(hidden_w, last[:, :, None], axis=1)[:, 0],
            st["h_prev"],
        )

        # full-window writes; inactive rows write into the slack region
        off_out = jnp.where(active, st["emitted"], max_new_tokens)
        hid_window = jnp.concatenate([st["h_prev"][:, None], hidden_w[:, : k - 1]], axis=1)
        out_tokens = upd_row(st["out_tokens"], window, off_out)
        out_hidden = upd_row(st["out_hidden"], hid_window, off_out)

        # history append: committed drafts then the new current token; the
        # garbage tail of the k-window is past hist_len and never matched
        shifted = jnp.concatenate([window[:, 1:], window[:, -1:]], axis=1)
        hist_vals = jnp.where(j_idx == last, tok_new[:, None], shifted)
        off_hist = jnp.where(active, st["hist_len"], smax - k)
        hist = upd_row(st["hist"], hist_vals, off_hist)

        return {
            "caches": caches,
            "tok": tok_new,
            "prev_tok": prev_new,
            "pos": pos_new,
            "write": st["write"] + n,
            "done": done_new,
            "hist": hist,
            "hist_len": st["hist_len"] + n,
            "h_prev": h_new,
            "out_tokens": out_tokens,
            "out_hidden": out_hidden,
            "emitted": st["emitted"] + n,
            "iters": st["iters"] + 1,
        }

    state = jax.lax.while_loop(cond, body, state)

    num_generated = state["emitted"]
    t_idx = jnp.arange(max_new_tokens)[None, :]
    tokens = jnp.where(
        t_idx < num_generated[:, None],
        state["out_tokens"][:, :max_new_tokens],
        eos_token_id,
    )
    gen_hidden = state["out_hidden"][:, :max_new_tokens]
    result = GenerateResult(tokens, gen_hidden, prefill_hidden, num_generated)
    if return_stats:
        iters = jnp.maximum(state["iters"], 1)
        stats = {
            "iters": state["iters"],
            "tokens_per_step": num_generated.sum() / (iters * b),
        }
        return result, stats
    return result

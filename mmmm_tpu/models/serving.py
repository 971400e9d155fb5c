"""Continuous batching: slot-based decode with in-flight refill.

The reference gets its offline-LLM throughput from vLLM, whose scheduler
replaces finished sequences inside a running batch (continuous batching)
instead of waiting for the slowest member (``scripts/data/vg/tag.py:355-359``).
``models/llm_batch.py`` covers the static-batched equivalent; this module adds
the scheduler, TPU-style:

  - a fixed pool of ``n_slots`` cache rows (static shapes — one compiled
    program per stage, no dynamic batch);
  - greedy decode runs in jitted chunks of ``chunk`` steps over ALL slots
    (a host round-trip per token would cost ~45 ms through the axon relay;
    idle slots ride along masked);
  - between chunks, finished slots are refilled: the next prompts prefill as
    a (bucketed) sub-batch whose caches scatter into the pool rows
    (``.at[slot_ids].set``), with per-slot ``kv_len``/``write`` state — the
    decode kernels already take per-sample lengths, and the ragged decode
    kernel (``ops/decode_kernel.py``) reads each row only up to its true
    length, so mixed-age slots cost what they use, not what the pool pads to.

  - automatic prefix caching (vLLM's APC): offline jobs build every prompt
    from one instruction template, so the longest common token prefix is
    prefilled ONCE and each request prefills only its suffix against the
    shared KV through the speculative-verify window path — static shapes,
    one extra compiled program per (sub-batch, suffix-bucket).

Greedy semantics are identical to ``generate.greedy_generate`` (same
position-freeze rule for ``<p>``/``</p>``, same eos forcing), so a prompt's
completion does not depend on which slots or neighbors it shared the pool
with — asserted by ``tests/test_serving.py``.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import MMMMTokenizer
from ..ops.quant import qdot
from .cogvlm import CogVLMConfig
from .cogvlm.decoder import llm_decode_step, llm_prefill


def _bucket(n: int, quant: int) -> int:
    return -(-n // quant) * quant


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclasses.dataclass
class _Request:
    rid: int
    ids: list[int]
    budget: int
    out: list[int] = dataclasses.field(default_factory=list)


class TextServer:
    """Continuous-batching greedy text generation over a slot pool.

    ``generate(prompts)`` returns completions in input order; throughput
    scales with mean (not max) completion length because finished slots are
    refilled mid-flight.
    """

    def __init__(
        self,
        params: dict,
        cfg: CogVLMConfig,
        tokenizer: MMMMTokenizer,
        *,
        n_slots: int = 8,
        max_new_tokens: int = 128,
        chunk: int = 16,
        seq_quant: int = 64,
        max_prompt_len: int = 512,
        attn_impl: str = "auto",
        prefix_cache: bool = True,
        min_prefix: int = 32,
        speculate: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.n_slots = n_slots
        self.max_new = max_new_tokens
        self.chunk = chunk
        self.seq_quant = seq_quant
        self.max_prompt = max_prompt_len
        self.attn_impl = attn_impl
        # automatic prefix caching (vLLM's APC property): offline LLM jobs
        # build every prompt from one instruction template, so the longest
        # common token prefix is computed ONCE and new requests prefill only
        # their suffix against the shared KV (see generate())
        self.prefix_cache = prefix_cache
        self.min_prefix = min_prefix
        # n-gram speculative decoding inside the slot pool: each chunk step
        # verifies a (speculate+1)-token window per slot — same weight reads
        # as one greedy step, 1..k committed tokens (models/speculate.py has
        # the one-shot equivalent; this composes it with continuous batching)
        self.spec = speculate
        # pool depth: longest prompt + full generation + one chunk of
        # overshoot (+ the k-wide verify-window slack when speculating)
        self.smax = _bucket(
            max_prompt_len + max_new_tokens + chunk + (speculate + 1), seq_quant
        )
        self._prefill_cache: dict = {}
        self._decode = None
        self.stats = {
            "chunks": 0, "refills": 0, "refilled_mid_flight": 0,
            "prefix_len": 0, "prefix_tokens_saved": 0,
            "spec_steps": 0, "spec_committed": 0,
        }

    # ---- jitted stages ----------------------------------------------------

    def _prefill_fn(self, f: int, s: int):
        """(f prompts padded to s) -> (first tokens, sub caches, last state)."""
        key = (f, s)
        if key not in self._prefill_cache:
            cfg, attn_impl, smax = self.cfg, self.attn_impl, self.smax

            @jax.jit
            def run(params, ids, prompt_len):
                pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape)
                seg = (pos < prompt_len[:, None]).astype(jnp.int32)
                tt = jnp.zeros_like(ids)
                emb = params["llm"]["embed_tokens"][ids]
                hidden, caches = llm_prefill(
                    params["llm"], cfg, emb, tt, pos.astype(jnp.int32), seg,
                    smax=smax, attn_impl=attn_impl,
                )
                last = prompt_len - 1
                take = lambda a: jnp.take_along_axis(
                    a, last[:, None, None] if a.ndim == 3 else last[:, None], axis=1
                )
                last_hidden = take(hidden)[:, 0]
                logits = qdot(last_hidden, params["llm"]["lm_head"]).astype(jnp.float32)
                tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                last_tok = take(ids)[:, 0]
                return tok0, last_tok, caches

            self._prefill_cache[key] = run
        return self._prefill_cache[key]

    def _prefix_prefill_fn(self, s: int):
        """Shared-prefix prefill: (1, s) ids -> full-depth (1, H, smax, D)
        caches holding the prefix KV in slots [0, plen)."""
        key = ("prefix", s)
        if key not in self._prefill_cache:
            cfg, attn_impl, smax = self.cfg, self.attn_impl, self.smax

            @jax.jit
            def run(params, ids, plen):
                pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape)
                seg = (pos < plen[:, None]).astype(jnp.int32)
                tt = jnp.zeros_like(ids)
                emb = params["llm"]["embed_tokens"][ids]
                _, caches = llm_prefill(
                    params["llm"], cfg, emb, tt, pos.astype(jnp.int32), seg,
                    smax=smax, attn_impl=attn_impl,
                )
                return caches

            self._prefill_cache[key] = run
        return self._prefill_cache[key]

    def _prefix_refill_fn(self, f: int, s: int, p: int):
        """Suffix-only prefill continuing from the shared-prefix KV.

        Reuses the speculative-verify window machinery: the (f, s) suffix runs
        through ``llm_decode_step`` with ``write_index = p`` and per-position
        ``kv_len[b, j] = p + j + 1``, so window position j attends the full
        prefix plus window tokens <= j (causal), and each layer writes the
        suffix K/V straight into cache slots [p, p+s). Prefix FLOPs are paid
        once per job instead of once per request."""
        key = ("pfx_refill", f, s, p)
        if key not in self._prefill_cache:
            cfg, attn_impl = self.cfg, self.attn_impl

            @jax.jit
            def run(params, prefix_caches, ids, suffix_len):
                emb = params["llm"]["embed_tokens"][ids]  # (f, s, C)
                pos = p + jnp.broadcast_to(
                    jnp.arange(s, dtype=jnp.int32)[None], (f, s)
                )
                caches = jax.tree.map(
                    lambda a: jnp.broadcast_to(a, (f,) + a.shape[1:]),
                    prefix_caches,
                )
                write = jnp.full((f,), p, jnp.int32)
                # padded tail positions clamp to the last real token: their
                # outputs are discarded and their garbage cache writes sit in
                # slots >= p + suffix_len, beyond every later read (the next
                # decode write lands at p + suffix_len and kv_len caps reads)
                j = jnp.arange(s, dtype=jnp.int32)[None]
                kv_len = p + jnp.minimum(j, suffix_len[:, None] - 1) + 1
                hidden, caches = llm_decode_step(
                    params["llm"], cfg, emb, None, pos, caches,
                    write, kv_len, attn_impl=attn_impl,
                )
                last = suffix_len - 1
                last_hidden = jnp.take_along_axis(
                    hidden, last[:, None, None], axis=1
                )[:, 0]
                logits = qdot(last_hidden, params["llm"]["lm_head"]).astype(jnp.float32)
                tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                last_tok = jnp.take_along_axis(ids, last[:, None], axis=1)[:, 0]
                return tok0, last_tok, caches

            self._prefill_cache[key] = run
        return self._prefill_cache[key]

    def _scatter_fn(self):
        if "scatter" not in self._prefill_cache:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def scatter(caches, sub, slots):
                def one(big, small):
                    return big.at[slots].set(small.astype(big.dtype))

                return jax.tree.map(one, caches, sub)

            self._prefill_cache["scatter"] = scatter
        return self._prefill_cache["scatter"]

    def _decode_fn(self):
        if self._decode is None:
            cfg, attn_impl, chunk, smax = self.cfg, self.attn_impl, self.chunk, self.smax
            eos, bop, eop = (
                self.tok.eos_token_id, self.tok.bop_token_id, self.tok.eop_token_id,
            )

            @functools.partial(jax.jit, donate_argnums=(1,))
            def run(params, state):
                b = state["tok"].shape[0]

                def step(st, _):
                    tok, prev = st["tok"], st["prev_tok"]
                    keep = (prev == bop) | (tok == eop)
                    pos = st["pos"] + 1 - keep.astype(st["pos"].dtype)
                    emb = params["llm"]["embed_tokens"][tok][:, None, :]
                    tt = jnp.full((b, 2), 0, jnp.int32)
                    write = jnp.minimum(st["write"], smax - 1)
                    hidden, caches = llm_decode_step(
                        params["llm"], cfg, emb, tt, pos[:, None], st["caches"],
                        write, write + 1, attn_impl=attn_impl,
                    )
                    hidden = hidden[:, 0]
                    logits = qdot(hidden, params["llm"]["lm_head"]).astype(jnp.float32)
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    nxt = jnp.where(st["done"], eos, nxt)
                    emitted = st["tok"]
                    new = {
                        "caches": caches,
                        "tok": nxt,
                        "prev_tok": tok,
                        "pos": pos,
                        "write": write + 1,
                        "done": st["done"] | (nxt == eos),
                    }
                    return new, emitted

                state, toks = jax.lax.scan(step, state, None, length=chunk)
                return state, toks.T  # (B, chunk)

            self._decode = run
        return self._decode

    def _decode_spec_fn(self):
        """Chunk of ``chunk`` VERIFY steps: each step drafts k-1 tokens by
        n-gram lookup over the slot's own history, verifies the k-window in
        one ``llm_decode_step`` (same weight reads as a single greedy step),
        and commits the longest argmax-matching prefix — token-identical to
        the greedy chunk (``models/speculate.py`` documents the rules; this
        adapts them to the slot pool with device-side budget/emitted counters
        so rejected slack never overflows the cache)."""
        if self._decode is None:
            cfg, attn_impl, chunk, smax = self.cfg, self.attn_impl, self.chunk, self.smax
            k = self.spec + 1
            eos, bop, eop = (
                self.tok.eos_token_id, self.tok.bop_token_id, self.tok.eop_token_id,
            )
            from .speculate import ngram_draft

            @functools.partial(jax.jit, donate_argnums=(1,))
            def run(params, state):
                b = state["tok"].shape[0]
                j_idx = jnp.arange(k)[None, :]
                upd_row = jax.vmap(
                    lambda a, u, i: jax.lax.dynamic_update_slice_in_dim(a, u, i, axis=0)
                )

                def step(st, _):
                    active = (~st["done"]) & (st["emitted"] < st["budget"])
                    drafts = ngram_draft(st["hist"], st["hist_len"], n_draft=k - 1)
                    window = jnp.concatenate([st["tok"][:, None], drafts], axis=1)
                    prevs = jnp.concatenate(
                        [st["prev_tok"][:, None], window[:, :-1]], axis=1
                    )
                    keep = (prevs == bop) | (window == eop)
                    pos_w = st["pos"][:, None] + jnp.cumsum(
                        1 - keep.astype(st["pos"].dtype), axis=1
                    )
                    emb = params["llm"]["embed_tokens"][window]
                    write = jnp.minimum(st["write"], smax - k)
                    kv_len = write[:, None] + jnp.arange(1, k + 1)[None, :]
                    hidden_w, caches = llm_decode_step(
                        params["llm"], cfg, emb, None, pos_w, st["caches"],
                        write, kv_len, attn_impl=attn_impl,
                    )
                    logits = qdot(hidden_w, params["llm"]["lm_head"]).astype(jnp.float32)
                    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k)
                    match = (window[:, 1:] == g[:, :-1]).astype(jnp.int32)
                    a = jnp.cumprod(match, axis=1).sum(axis=1)
                    noneos = jnp.cumprod((window != eos).astype(jnp.int32), axis=1)
                    commit = (j_idx <= a[:, None]) & (noneos == 1)
                    n_raw = commit.sum(axis=1)
                    room = jnp.maximum(st["budget"] - st["emitted"], 0)
                    n = jnp.where(active, jnp.minimum(n_raw, room), 0)
                    eos_hit = jnp.take_along_axis(noneos, a[:, None], axis=1)[:, 0] == 0
                    last = jnp.maximum(n - 1, 0)[:, None]
                    take_tok = lambda arr: jnp.take_along_axis(arr, last, axis=1)[:, 0]
                    nxt = take_tok(g)
                    done_new = st["done"] | (
                        active
                        & ((eos_hit & (n == n_raw)) | (nxt == eos)
                           | (st["emitted"] + n >= st["budget"]))
                    )
                    tok_new = jnp.where(
                        active, jnp.where(done_new, eos, nxt), st["tok"]
                    )
                    # history append: committed drafts then the new token
                    shifted = jnp.concatenate([window[:, 1:], window[:, -1:]], axis=1)
                    hist_vals = jnp.where(j_idx == last, tok_new[:, None], shifted)
                    off_hist = jnp.where(active, st["hist_len"], smax - k)
                    new = {
                        "caches": caches,
                        "tok": tok_new,
                        "prev_tok": jnp.where(active, take_tok(window), st["prev_tok"]),
                        "pos": jnp.where(active, take_tok(pos_w), st["pos"]),
                        "write": write + n,
                        "done": done_new,
                        "hist": upd_row(st["hist"], hist_vals, off_hist),
                        "hist_len": st["hist_len"] + n,
                        "budget": st["budget"],
                        "emitted": st["emitted"] + n,
                    }
                    return new, (window, n, done_new)

                state, (toks, ns, dones) = jax.lax.scan(step, state, None, length=chunk)
                # (B, chunk, k) windows, (B, chunk) commit counts / done flags
                return state, (toks.swapaxes(0, 1), ns.T, dones.T)

            self._decode = run
        return self._decode

    # ---- host scheduler ---------------------------------------------------

    def generate(
        self, prompts: list[str], max_new: list[int] | None = None
    ) -> list[str]:
        """``max_new`` optionally carries a per-request token budget (defaults
        to the server's ``max_new_tokens``), as in vLLM's per-request params."""
        tok = self.tok
        reqs = []
        for rid, p in enumerate(prompts):
            ids = [tok.bos_token_id] + tok.encode(p)
            if len(ids) > self.max_prompt:
                ids = ids[: self.max_prompt]
            budget = min(
                self.max_new if max_new is None else max_new[rid], self.max_new
            )
            reqs.append(_Request(rid, ids, budget))
        # longest-first: long prompts enter the pool early so the tail of the
        # run drains short ones
        queue = sorted(reqs, key=lambda r: -len(r.ids))
        results: dict[int, list[int]] = {}

        # automatic prefix caching: longest common token prefix of the job
        # (every request must keep >= 1 suffix token so its prefill emits a
        # first token); prefilled ONCE below, suffixes continue from its KV
        pfx_len = 0
        pfx_caches = None
        if self.prefix_cache and len(reqs) > 1:
            first = reqs[0].ids
            cap = min(len(r.ids) for r in reqs) - 1
            while pfx_len < cap and all(
                r.ids[pfx_len] == first[pfx_len] for r in reqs
            ):
                pfx_len += 1
            if pfx_len < self.min_prefix:
                pfx_len = 0
        if pfx_len:
            sp = _bucket(pfx_len, self.seq_quant)
            ids = np.zeros((1, sp), np.int32)
            ids[0, :pfx_len] = reqs[0].ids[:pfx_len]
            pfx_caches = self._prefix_prefill_fn(sp)(
                self.params, jnp.asarray(ids),
                jnp.asarray([pfx_len], jnp.int32),
            )
            self.stats["prefix_len"] = pfx_len
            self.stats["prefix_tokens_saved"] = pfx_len * (len(reqs) - 1)

        b, smax = self.n_slots, self.smax
        hd = self.cfg.num_attention_heads, self.cfg.head_dim
        # pool dtype follows the model's compute dtype (decode writes raw k/v)
        cdt = self.params["llm"]["embed_tokens"].dtype
        caches = [
            (
                jnp.zeros((b, hd[0], smax, hd[1]), cdt),
                jnp.zeros((b, hd[0], smax, hd[1]), cdt),
            )
            for _ in range(self.cfg.num_hidden_layers)
        ]
        state = {
            "caches": caches,
            "tok": jnp.zeros((b,), jnp.int32),
            "prev_tok": jnp.zeros((b,), jnp.int32),
            "pos": jnp.zeros((b,), jnp.int32),
            "write": jnp.zeros((b,), jnp.int32),
            "done": jnp.ones((b,), bool),
        }
        if self.spec:
            state.update(
                hist=jnp.zeros((b, smax), jnp.int32),
                hist_len=jnp.ones((b,), jnp.int32),
                budget=jnp.zeros((b,), jnp.int32),
                emitted=jnp.zeros((b,), jnp.int32),
            )
        slot_req: list[_Request | None] = [None] * b
        slot_budget = np.zeros(b, np.int64)

        def refill(state):
            free = [i for i in range(b) if slot_req[i] is None]
            if not free or not queue:
                return state
            self.stats["refills"] += 1
            if any(r is not None for r in slot_req):
                # the continuous-batching property: new work entered the pool
                # while other slots were mid-request
                self.stats["refilled_mid_flight"] += 1
            take = [queue.pop(0) for _ in range(min(len(free), len(queue)))]
            f = _pow2(len(take))
            if pfx_len:
                # suffix-only prefill continuing from the shared-prefix KV
                s = _bucket(max(len(r.ids) - pfx_len for r in take), self.seq_quant)
                ids = np.zeros((f, s), np.int32)
                plen = np.full((f,), pfx_len + 1, np.int32)
                sfx = np.ones((f,), np.int32)
                for row, r in enumerate(take):
                    suffix = r.ids[pfx_len:]
                    ids[row, : len(suffix)] = suffix
                    sfx[row] = len(suffix)
                    plen[row] = len(r.ids)
                tok0, last_tok, sub = self._prefix_refill_fn(f, s, pfx_len)(
                    self.params, pfx_caches, jnp.asarray(ids), jnp.asarray(sfx)
                )
            else:
                s = _bucket(max(len(r.ids) for r in take), self.seq_quant)
                ids = np.zeros((f, s), np.int32)
                plen = np.ones((f,), np.int32)
                for row, r in enumerate(take):
                    ids[row, : len(r.ids)] = r.ids
                    plen[row] = len(r.ids)
                tok0, last_tok, sub = self._prefill_fn(f, s)(
                    self.params, jnp.asarray(ids), jnp.asarray(plen)
                )
            rows = list(range(len(take)))
            slots = [free[i] for i in rows]
            sub_rows = jnp.asarray(rows, jnp.int32)
            slot_ids = jnp.asarray(slots, jnp.int32)
            sub_taken = jax.tree.map(lambda a: a[sub_rows], sub)
            new_caches = self._scatter_fn()(state["caches"], sub_taken, slot_ids)
            tok0_np, last_np = np.asarray(tok0), np.asarray(last_tok)
            upd = lambda arr, vals: arr.at[slot_ids].set(jnp.asarray(vals))
            new_state = {
                "caches": new_caches,
                "tok": upd(state["tok"], tok0_np[rows]),
                "prev_tok": upd(state["prev_tok"], last_np[rows]),
                "pos": upd(state["pos"], plen[rows] - 1),
                "write": upd(state["write"], plen[rows]),
                "done": upd(state["done"], tok0_np[rows] == tok.eos_token_id),
            }
            if self.spec:
                # per-slot n-gram history: full prompt (prefix included even
                # in prefix-cache mode — drafts may match template phrases)
                # with the prefill's first token appended
                hr = np.zeros((len(take), self.smax), np.int32)
                for row, r in enumerate(take):
                    hr[row, : len(r.ids)] = r.ids
                    hr[row, len(r.ids)] = tok0_np[row]
                new_state.update(
                    hist=upd(state["hist"], hr),
                    hist_len=upd(state["hist_len"], plen[rows] + 1),
                    budget=upd(
                        state["budget"],
                        np.asarray([r.budget for r in take], np.int32),
                    ),
                    emitted=upd(state["emitted"], np.zeros(len(take), np.int32)),
                )
            state = new_state
            for row, r in enumerate(take):
                slot_req[slots[row]] = r
                slot_budget[slots[row]] = r.budget
            return state

        decode = self._decode_spec_fn() if self.spec else self._decode_fn()
        while queue or any(r is not None for r in slot_req):
            state = refill(state)
            self.stats["chunks"] += 1
            if self.spec:
                state, (win, ns, dones) = decode(self.params, state)
                win, ns, dones = np.asarray(win), np.asarray(ns), np.asarray(dones)
                self.stats["spec_steps"] += int((ns > 0).sum())
                self.stats["spec_committed"] += int(ns.sum())
                for i in range(b):
                    r = slot_req[i]
                    if r is None:
                        continue
                    for j in range(self.chunk):
                        n = int(ns[i, j])
                        r.out.extend(int(t) for t in win[i, j, :n])
                        if dones[i, j] or len(r.out) >= slot_budget[i]:
                            results[r.rid] = r.out[: int(slot_budget[i])]
                            slot_req[i] = None
                            break
                continue
            state, toks = decode(self.params, state)
            toks = np.asarray(toks)  # (B, chunk) tokens emitted this chunk
            for i in range(b):
                r = slot_req[i]
                if r is None:
                    continue
                for t in toks[i]:
                    t = int(t)
                    done = t == tok.eos_token_id
                    if not done:
                        r.out.append(t)
                    if done or len(r.out) >= slot_budget[i]:
                        results[r.rid] = r.out
                        slot_req[i] = None
                        break

        for r in reqs:  # anything still in flight when loop exits
            if r.rid not in results:
                results[r.rid] = r.out
        return [self.tok.decode(results[r.rid]) for r in reqs]


class GroundedServer:
    """Continuous batching for the FULL grounded-report path.

    The multimodal sibling of ``TextServer``: requests are (image, prompt)
    pairs; refill runs the EVA ViT + LLM prefill over the joining sub-batch
    and scatters their caches into the slot pool; decode runs in jitted
    chunks with a device-resident hidden ring buffer (B, max_new, C) — the
    per-step hidden states SAM prompting needs stay on-device instead of
    streaming through the slow host link; when a request finishes, its
    ``</p>`` positions are parsed on host and the SAM semantic pass runs over
    the finished group, gathered straight from the ring buffer.

    One server instance serves one static image/prompt-bucket family (the
    deployment norm: fixed preprocessing), so every stage compiles once.
    Greedy semantics match ``inference.generate_grounded`` exactly — asserted
    by ``tests/test_serving.py::test_grounded_server_matches_batch``.
    """

    def __init__(
        self,
        params: dict,
        cfg,  # MMMMConfig
        tokenizer: MMMMTokenizer,
        *,
        patch_size,
        pool_size,
        n_vis: int,
        n_slots: int = 8,
        max_new_tokens: int = 128,
        chunk: int = 16,
        seq_quant: int = 32,
        max_prompt_len: int = 256,
        max_targets: int = 8,
        attn_impl: str = "auto",
        speculate: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.patch = tuple(patch_size)
        self.pool = tuple(pool_size)
        self.n_vis = n_vis
        self.n_slots = n_slots
        self.max_new = max_new_tokens
        self.chunk = chunk
        self.seq_quant = seq_quant
        self.max_prompt = max_prompt_len
        self.max_targets = max_targets
        self.attn_impl = attn_impl
        # n-gram speculation (as in TextServer), extended to the grounded
        # path: the hidden ring buffer takes k-wide window writes so SAM
        # prompting still gathers the exact hidden state of every </p>
        self.spec = speculate
        self.smax = _bucket(
            max_prompt_len + max_new_tokens + chunk + (speculate + 1), seq_quant
        )
        self._jit: dict = {}
        self.stats = {
            "chunks": 0, "refills": 0, "refilled_mid_flight": 0,
            "spec_steps": 0, "spec_committed": 0,
        }

    # ---- jitted stages ----------------------------------------------------

    def _prefill(self, f: int, s: int):
        key = ("prefill", f, s)
        if key not in self._jit:
            from .cogvlm.model import splice_vision_embeds
            from .cogvlm.vit import vit_forward

            cfg, smax, attn_impl = self.cfg, self.smax, self.attn_impl
            patch, pool, n_vis = self.patch, self.pool, self.n_vis

            @jax.jit
            def run(params, ids, tt, pos, prompt_len, image):
                emb = params["cogvlm"]["llm"]["embed_tokens"][ids]
                vis = vit_forward(
                    params["cogvlm"]["vision"], cfg.vlm, image, patch, pool,
                    attn_impl=attn_impl,
                )
                emb = splice_vision_embeds(emb, vis)
                seg = (
                    jnp.arange(ids.shape[1])[None] < prompt_len[:, None]
                ).astype(jnp.int32)
                hidden, caches = llm_prefill(
                    params["cogvlm"]["llm"], cfg.vlm, emb, tt, pos, seg,
                    smax=smax, attn_impl=attn_impl, vis_span=(1, 1 + n_vis),
                )
                last = prompt_len - 1
                take = lambda a: jnp.take_along_axis(
                    a, last[:, None, None] if a.ndim == 3 else last[:, None], axis=1
                )
                last_hidden = take(hidden)[:, 0]
                logits = qdot(
                    last_hidden, params["cogvlm"]["llm"]["lm_head"]
                ).astype(jnp.float32)
                tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tok0, take(ids)[:, 0], take(pos)[:, 0], last_hidden, caches

            self._jit[key] = run
        return self._jit[key]

    def _scatter(self):
        if "scatter" not in self._jit:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def scatter(pool_state, sub, slots):
                return jax.tree.map(
                    lambda big, small: big.at[slots].set(small.astype(big.dtype)),
                    pool_state, sub,
                )

            self._jit["scatter"] = scatter
        return self._jit["scatter"]

    def _decode(self):
        if "decode" not in self._jit:
            cfg, attn_impl, chunk, smax = self.cfg, self.attn_impl, self.chunk, self.smax
            max_new = self.max_new
            eos, bop, eop = (
                self.tok.eos_token_id, self.tok.bop_token_id, self.tok.eop_token_id,
            )

            @functools.partial(jax.jit, donate_argnums=(1,))
            def run(params, state):
                b = state["tok"].shape[0]

                def step(st, _):
                    tok, prev = st["tok"], st["prev_tok"]
                    keep = (prev == bop) | (tok == eop)
                    pos = st["pos"] + 1 - keep.astype(st["pos"].dtype)
                    emb = params["cogvlm"]["llm"]["embed_tokens"][tok][:, None, :]
                    tt = jnp.zeros((b, 2), jnp.int32)
                    write = jnp.minimum(st["write"], smax - 1)
                    hidden, caches = llm_decode_step(
                        params["cogvlm"]["llm"], cfg.vlm, emb, tt, pos[:, None],
                        st["caches"], write, write + 1, attn_impl=attn_impl,
                    )
                    hidden = hidden[:, 0]
                    logits = qdot(
                        hidden, params["cogvlm"]["llm"]["lm_head"]
                    ).astype(jnp.float32)
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    nxt = jnp.where(st["done"], eos, nxt)
                    emitted = st["tok"]
                    # ring buffer: hidden produced token (cnt+1); slot cnt+1
                    cnt = jnp.minimum(st["cnt"] + 1, max_new - 1)
                    hbuf = jax.vmap(
                        lambda buf, h, i: jax.lax.dynamic_update_slice_in_dim(
                            buf, h[None].astype(buf.dtype), i, 0
                        )
                    )(st["hbuf"], hidden, cnt)
                    new = {
                        "caches": caches, "tok": nxt, "prev_tok": tok, "pos": pos,
                        "write": write + 1, "done": st["done"] | (nxt == eos),
                        "cnt": cnt, "hbuf": hbuf,
                    }
                    return new, emitted

                state, toks = jax.lax.scan(step, state, None, length=chunk)
                return state, toks.T

            self._jit["decode"] = run
        return self._jit["decode"]

    def _decode_spec(self):
        """Speculative chunk for the grounded path: the TextServer verify
        window plus k-wide hidden-ring-buffer writes — ``hbuf[emitted + j]``
        holds the hidden state that produced generated token ``emitted + j``,
        exactly the greedy convention SAM prompting gathers from."""
        if "decode" not in self._jit:
            cfg, attn_impl, chunk, smax = self.cfg, self.attn_impl, self.chunk, self.smax
            max_new = self.max_new
            k = self.spec + 1
            eos, bop, eop = (
                self.tok.eos_token_id, self.tok.bop_token_id, self.tok.eop_token_id,
            )
            from .speculate import ngram_draft

            @functools.partial(jax.jit, donate_argnums=(1,))
            def run(params, state):
                j_idx = jnp.arange(k)[None, :]
                upd_row = jax.vmap(
                    lambda a, u, i: jax.lax.dynamic_update_slice_in_dim(a, u, i, axis=0)
                )

                def step(st, _):
                    active = (~st["done"]) & (st["emitted"] < max_new)
                    drafts = ngram_draft(st["hist"], st["hist_len"], n_draft=k - 1)
                    window = jnp.concatenate([st["tok"][:, None], drafts], axis=1)
                    prevs = jnp.concatenate(
                        [st["prev_tok"][:, None], window[:, :-1]], axis=1
                    )
                    keep = (prevs == bop) | (window == eop)
                    pos_w = st["pos"][:, None] + jnp.cumsum(
                        1 - keep.astype(st["pos"].dtype), axis=1
                    )
                    emb = params["cogvlm"]["llm"]["embed_tokens"][window]
                    write = jnp.minimum(st["write"], smax - k)
                    kv_len = write[:, None] + jnp.arange(1, k + 1)[None, :]
                    hidden_w, caches = llm_decode_step(
                        params["cogvlm"]["llm"], cfg.vlm, emb, None, pos_w,
                        st["caches"], write, kv_len, attn_impl=attn_impl,
                    )
                    logits = qdot(
                        hidden_w, params["cogvlm"]["llm"]["lm_head"]
                    ).astype(jnp.float32)
                    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = (window[:, 1:] == g[:, :-1]).astype(jnp.int32)
                    a = jnp.cumprod(match, axis=1).sum(axis=1)
                    noneos = jnp.cumprod((window != eos).astype(jnp.int32), axis=1)
                    commit = (j_idx <= a[:, None]) & (noneos == 1)
                    n_raw = commit.sum(axis=1)
                    room = jnp.maximum(max_new - st["emitted"], 0)
                    n = jnp.where(active, jnp.minimum(n_raw, room), 0)
                    eos_hit = jnp.take_along_axis(noneos, a[:, None], axis=1)[:, 0] == 0
                    last = jnp.maximum(n - 1, 0)[:, None]
                    take_tok = lambda arr: jnp.take_along_axis(arr, last, axis=1)[:, 0]
                    nxt = take_tok(g)
                    done_new = st["done"] | (
                        active
                        & ((eos_hit & (n == n_raw)) | (nxt == eos)
                           | (st["emitted"] + n >= max_new))
                    )
                    tok_new = jnp.where(active, jnp.where(done_new, eos, nxt), st["tok"])
                    # hidden ring buffer: window token j was produced by
                    # h_prev (j=0) / hidden_w[j-1]; inactive rows park in the
                    # k-slot slack past max_new
                    hid_window = jnp.concatenate(
                        [st["h_prev"][:, None], hidden_w[:, : k - 1]], axis=1
                    ).astype(st["hbuf"].dtype)
                    off = jnp.where(active, st["emitted"], max_new)
                    hbuf = upd_row(st["hbuf"], hid_window, off)
                    h_new = jnp.where(
                        active[:, None],
                        jnp.take_along_axis(hidden_w, last[:, :, None], axis=1)[:, 0],
                        st["h_prev"],
                    )
                    shifted = jnp.concatenate([window[:, 1:], window[:, -1:]], axis=1)
                    hist_vals = jnp.where(j_idx == last, tok_new[:, None], shifted)
                    off_hist = jnp.where(active, st["hist_len"], smax - k)
                    new = {
                        "caches": caches,
                        "tok": tok_new,
                        "prev_tok": jnp.where(active, take_tok(window), st["prev_tok"]),
                        "pos": jnp.where(active, take_tok(pos_w), st["pos"]),
                        "write": write + n,
                        "done": done_new,
                        "hbuf": hbuf,
                        "h_prev": h_new,
                        "hist": upd_row(st["hist"], hist_vals, off_hist),
                        "hist_len": st["hist_len"] + n,
                        "emitted": st["emitted"] + n,
                    }
                    return new, (window, n, done_new)

                state, (toks, ns, dones) = jax.lax.scan(step, state, None, length=chunk)
                return state, (toks.swapaxes(0, 1), ns.T, dones.T)

            self._jit["decode"] = run
        return self._jit["decode"]

    def _ground(self, f: int):
        key = ("ground", f)
        if key not in self._jit:
            from .mmmm import vg_project
            from .segvol import sam_forward

            cfg, patch, attn_impl = self.cfg, self.patch, self.attn_impl

            @jax.jit
            def run(params, hbuf, slots, positions, g_image):
                hidden = hbuf[slots].astype(jnp.float32)  # (F, max_new, C)
                gathered = jnp.take_along_axis(hidden, positions[..., None], axis=1)
                prompts = vg_project(params, gathered)
                masks, _ = sam_forward(
                    params["sam"], cfg.sam, g_image.astype(jnp.float32), patch,
                    prompts, attn_impl=attn_impl,
                )
                return masks

            self._jit[key] = run
        return self._jit[key]

    # ---- host scheduler ---------------------------------------------------

    def generate(self, requests: list[dict], fetch_grounding: bool = True):
        """``requests``: dicts with input_ids/token_type_ids/position_ids
        (1-D numpy, unpadded), image (C, D, H, W), optional grounding_image.
        Returns a list of dicts {text, tokens, targets, masks} in order."""
        tok = self.tok
        queue = sorted(range(len(requests)), key=lambda i: -len(requests[i]["input_ids"]))
        results: list[dict | None] = [None] * len(requests)

        b, smax, c = self.n_slots, self.smax, self.cfg.vlm.hidden_size
        hd = self.cfg.vlm.num_attention_heads, self.cfg.vlm.head_dim
        cdt = self.params["cogvlm"]["llm"]["embed_tokens"].dtype
        state = {
            "caches": [
                (jnp.zeros((b, hd[0], smax, hd[1]), cdt),
                 jnp.zeros((b, hd[0], smax, hd[1]), cdt))
                for _ in range(self.cfg.vlm.num_hidden_layers)
            ],
            "tok": jnp.zeros((b,), jnp.int32),
            "prev_tok": jnp.zeros((b,), jnp.int32),
            "pos": jnp.zeros((b,), jnp.int32),
            "write": jnp.zeros((b,), jnp.int32),
            "done": jnp.ones((b,), bool),
        }
        if self.spec:
            state.update(
                # k-slot slack: inactive rows park full windows past max_new
                hbuf=jnp.zeros((b, self.max_new + self.spec + 1, c), cdt),
                h_prev=jnp.zeros((b, c), cdt),
                hist=jnp.zeros((b, smax), jnp.int32),
                hist_len=jnp.ones((b,), jnp.int32),
                emitted=jnp.zeros((b,), jnp.int32),
            )
        else:
            state.update(
                cnt=jnp.zeros((b,), jnp.int32),
                hbuf=jnp.zeros((b, self.max_new, c), cdt),
            )
        slot_rid: list[int | None] = [None] * b
        slot_out: list[list[int]] = [[] for _ in range(b)]

        def refill(state):
            free = [i for i in range(b) if slot_rid[i] is None]
            if not free or not queue:
                return state
            self.stats["refills"] += 1
            if any(r is not None for r in slot_rid):
                self.stats["refilled_mid_flight"] += 1
            take = [queue.pop(0) for _ in range(min(len(free), len(queue)))]
            f = _pow2(len(take))
            s = _bucket(
                max(len(requests[r]["input_ids"]) for r in take), self.seq_quant
            )
            ids = np.zeros((f, s), np.int32)
            tt = np.zeros((f, s), np.int32)
            pos = np.zeros((f, s), np.int32)
            plen = np.ones((f,), np.int32)
            img_shape = requests[take[0]]["image"].shape
            imgs = np.zeros((f, *img_shape), np.float32)
            for row, r in enumerate(take):
                req = requests[r]
                L = len(req["input_ids"])
                ids[row, :L] = req["input_ids"]
                tt[row, :L] = req["token_type_ids"]
                pos[row, :L] = req["position_ids"]
                plen[row] = L
                imgs[row] = req["image"]
            tok0, last_tok, last_pos, last_hidden, sub_caches = self._prefill(f, s)(
                self.params, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(pos),
                jnp.asarray(plen), jnp.asarray(imgs, cdt),
            )
            rows = jnp.arange(len(take))
            slots = jnp.asarray([free[i] for i in range(len(take))], jnp.int32)
            sub = {
                "caches": jax.tree.map(lambda a: a[rows], sub_caches),
                "tok": tok0[rows], "prev_tok": last_tok[rows], "pos": last_pos[rows],
                "write": jnp.asarray(plen)[rows],
                "done": (tok0 == tok.eos_token_id)[rows],
            }
            if self.spec:
                hr = np.zeros((len(take), self.smax), np.int32)
                tok0_np = np.asarray(tok0)
                for row, r in enumerate(take):
                    L = len(requests[r]["input_ids"])
                    hr[row, :L] = requests[r]["input_ids"]
                    hr[row, L] = tok0_np[row]
                sub.update(
                    hbuf=jnp.zeros(
                        (len(take), self.max_new + self.spec + 1, c), cdt
                    ).at[:, 0].set(last_hidden[rows].astype(cdt)),
                    h_prev=last_hidden[rows].astype(cdt),
                    hist=jnp.asarray(hr),
                    hist_len=jnp.asarray(plen)[rows] + 1,
                    emitted=jnp.zeros((len(take),), jnp.int32),
                )
            else:
                sub.update(
                    cnt=jnp.zeros((len(take),), jnp.int32),
                    hbuf=jnp.zeros((len(take), self.max_new, c), cdt).at[:, 0].set(
                        last_hidden[rows].astype(cdt)
                    ),
                )
            state = self._scatter()(state, sub, slots)
            for row, r in enumerate(take):
                slot_rid[int(slots[row])] = r
                slot_out[int(slots[row])] = []
            return state

        decode = self._decode_spec() if self.spec else self._decode()
        pending_ground: list[tuple[int, int]] = []  # (rid, slot) awaiting SAM

        def flush_ground(state):
            if not pending_ground:
                return
            f = _pow2(len(pending_ground))
            group = pending_ground[: f if f <= len(pending_ground) else len(pending_ground)]
            del pending_ground[: len(group)]
            fpad = _pow2(len(group))
            positions = np.zeros((fpad, self.max_targets), np.int64)
            valid = np.zeros((fpad, self.max_targets), bool)
            slots_np = np.zeros((fpad,), np.int32)
            g_shape = None
            g_imgs = None
            for row, (rid, slot) in enumerate(group):
                slots_np[row] = slot
                out = np.asarray(results[rid]["tokens"])
                (eops,) = np.nonzero(out == tok.eop_token_id)
                eops = eops[: self.max_targets]
                positions[row, : len(eops)] = eops
                valid[row, : len(eops)] = True
                gi = requests[rid].get("grounding_image")
                if gi is not None:
                    if g_imgs is None:
                        g_shape = gi.shape
                        # preserve the caller's dtype: uint8 (the processed
                        # on-disk format) ships 4x fewer bytes through the
                        # relay/PCIe; the SAM stage casts to fp32 in-graph
                        g_imgs = np.zeros((fpad, *g_shape), np.asarray(gi).dtype)
                    assert np.asarray(gi).dtype == g_imgs.dtype, (
                        "mixed grounding_image dtypes in one serving job"
                    )
                    g_imgs[row] = gi
            if g_imgs is None:
                return
            masks = self._ground(fpad)(
                self.params, state["hbuf"], jnp.asarray(slots_np),
                jnp.asarray(positions), jnp.asarray(g_imgs),
            )
            masks_np = np.asarray(masks) if fetch_grounding else masks
            for row, (rid, slot) in enumerate(group):
                results[rid]["masks"] = (
                    masks_np[row] if fetch_grounding else masks_np
                )
                results[rid]["target_valid"] = valid[row]

        def finish(rid, i):
            out = np.asarray(slot_out[i][: self.max_new], np.int64)
            results[rid] = {
                "tokens": out,
                "text": tok.decode([int(x) for x in out]),
                "targets": tok.parse_targets(out[None])[0],
            }
            pending_ground.append((rid, i))
            slot_rid[i] = None

        while queue or any(r is not None for r in slot_rid):
            state = refill(state)
            self.stats["chunks"] += 1
            if self.spec:
                state, (win, ns, dones) = decode(self.params, state)
                win, ns, dones = np.asarray(win), np.asarray(ns), np.asarray(dones)
                self.stats["spec_steps"] += int((ns > 0).sum())
                self.stats["spec_committed"] += int(ns.sum())
                for i in range(b):
                    rid = slot_rid[i]
                    if rid is None:
                        continue
                    for j in range(self.chunk):
                        n = int(ns[i, j])
                        slot_out[i].extend(int(t) for t in win[i, j, :n])
                        if dones[i, j] or len(slot_out[i]) >= self.max_new:
                            finish(rid, i)
                            break
            else:
                state, toks = decode(self.params, state)
                toks = np.asarray(toks)
                for i in range(b):
                    rid = slot_rid[i]
                    if rid is None:
                        continue
                    for t in toks[i]:
                        t = int(t)
                        done = t == tok.eos_token_id
                        if not done:
                            slot_out[i].append(t)
                        if done or len(slot_out[i]) >= self.max_new:
                            finish(rid, i)
                            break
            # ground finished requests BEFORE their slots are refilled (the
            # ring buffer row is reused by the next occupant)
            flush_ground(state)
        return results

"""End-to-end grounded-pipeline torch parity (VERDICT r3 weak #3).

The per-module mirrors in ``test_torch_parity.py`` pin RMSNorm/RoPE/experts/
ViT/SegVol individually; this test pins the *integration* layer where
token-identity actually lives:

  prompt -> prefill (ViT splice + KV-cache build) -> multi-step greedy decode
  with the CogVLM <p>/</p> position-freeze (``mmmm.py:368-406``: the fed
  token's position does not advance when the previous token is ``<p>`` or the
  fed token is ``</p>``) -> host eop-position parse -> hidden gather +
  ``vg_proj`` -> SAM semantic mask logits (``mmmm.py:167-223``).

The torch mirror re-runs the FULL forward over the grown sequence at every
decode step (mathematically what the reference's KV-cached decode computes),
per sample and unpadded — so the JAX batched right-padded KV-cache decode
path is checked against an independent implementation of the same math.
Generated ids must match EXACTLY over every decode step, including steps
inside a generated <p>...</p> span; mask logits to fp32 tolerance.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmmm_tpu.data import MMMMTokenizer
from mmmm_tpu.models import MMMMConfig
from mmmm_tpu.models.cogvlm import CogVLMConfig, VisionConfig
from mmmm_tpu.models.inference import generate_grounded
from mmmm_tpu.train.import_torch import import_cogvlm, import_segvol_sam, merge_imported

from test_torch_parity import (  # noqa: E402
    PT_PATCH,
    PT_POS,
    make_cogvlm_state_dict,
    make_segvol_state_dict,
    torch_dense_pe,
    torch_llm_forward,
    torch_mask_decoder,
    torch_segvol_encoder,
    torch_segvol_surgery,
    torch_vit_forward,
    torch_vit_surgery,
)
from mmmm_tpu.models.segvol.sam import init_sam_params

TOK = MMMMTokenizer.byte_fallback()
E2E_CFG = CogVLMConfig(
    vocab_size=len(TOK),
    hidden_size=32,
    intermediate_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=128,
    vision=VisionConfig(
        hidden_size=24,
        intermediate_size=40,
        num_hidden_layers=2,
        num_heads=4,
        patch_size=(2, 6, 6),
        pos_embed_shape=(2, 4, 4),
        pt_pos_embed_shape=(5, 5),
    ),
)
PATCH, POOL = (2, 6, 6), (1, 2, 2)
N_VIS = 6  # boi + 1x2x2 pooled grid + eoi
MAX_NEW = 10
# generate_grounded passes ONE patch size to both the ViT and the SAM head
# (reference semantics: the data layer's per-sample patch size feeds both,
# and both encoders store 16^3 kernels at the flagship) — so the e2e SAM
# config uses the ViT patch, exercising the (1,4,4)->(2,6,6) kernel resample
from mmmm_tpu.models.segvol import SamConfig  # noqa: E402

E2E_SAM = SamConfig(
    in_channels=3,
    embed_dim=32,
    encoder_num_layers=2,
    encoder_num_heads=4,
    patch_size=PATCH,
    pos_embed_shape=(2, 4, 4),
    num_instances=3,
    decoder_depth=2,
    decoder_num_heads=8,
    decoder_mlp_dim=64,
)


def _mirror_generate(tsd, ids, tt, pos, image, max_new):
    """Torch mirror of the cached greedy decode, one sample, unpadded:
    full re-forward per step + the reference position-freeze rule."""
    emb_w = tsd["model.embed_tokens.weight"]
    vis_tok = torch_vit_forward(tsd, E2E_CFG, image[None], PATCH, POOL)[0]
    ids = list(ids)
    tt = list(tt)
    pos = list(pos)
    toks, hiddens = [], []
    for _ in range(max_new):
        emb = F.embedding(torch.as_tensor(ids, dtype=torch.int64), emb_w)
        emb = torch.cat([emb[:1], vis_tok, emb[1 + N_VIS:]], dim=0)
        padding = torch.ones(1, len(ids), dtype=torch.bool)
        hid, logits = torch_llm_forward(
            tsd, E2E_CFG, emb[None],
            torch.as_tensor(tt, dtype=torch.int64)[None],
            torch.as_tensor(pos, dtype=torch.int64)[None], padding,
        )
        hiddens.append(hid[0, -1])
        nxt = int(logits[0, -1].argmax())
        toks.append(nxt)
        if nxt == TOK.eos_token_id:
            break
        # reference freeze rule (mmmm.py:383-388): appending token `nxt`
        # after previous token ids[-1]
        keep = (ids[-1] == TOK.bop_token_id) or (nxt == TOK.eop_token_id)
        pos.append(pos[-1] + 1 - int(keep))
        ids.append(nxt)
        tt.append(0)
    return toks, hiddens


@pytest.fixture(scope="module")
def e2e_setup():
    gen = np.random.default_rng(7)
    sd = make_cogvlm_state_dict(E2E_CFG, gen)
    # Make the tiny random model emit a real <p> phrase </p> span during
    # greedy decode, deterministically: give <p>/</p> large distinctive
    # embeddings, then point the <p> head row at the prompt-end hidden state
    # and the </p> head row at the hidden state reached after <p> + one
    # phrase token (all computed with the torch mirror; both sides share the
    # state dict, so this shapes the MODEL, not the comparison).
    sd["lm_head.weight"][TOK.eos_token_id] *= 0.0  # don't stop early
    sd["model.embed_tokens.weight"][TOK.bop_token_id] = 5.0 * torch.from_numpy(
        gen.standard_normal(E2E_CFG.hidden_size).astype(np.float32)
    )
    sd["model.embed_tokens.weight"][TOK.eop_token_id] = 5.0 * torch.from_numpy(
        gen.standard_normal(E2E_CFG.hidden_size).astype(np.float32)
    )
    tsd0 = torch_vit_surgery(sd, E2E_CFG)
    ids, tt, pos, lens, image, _ = _prompts()
    L = lens[0]
    # h0: hidden at the prompt end -> <p> wins the first decode step
    _, hs = _mirror_generate(
        tsd0, ids[0, :L], tt[0, :L], pos[0, :L], torch.from_numpy(image[0]), 1
    )
    h0 = hs[0]
    sd["lm_head.weight"][TOK.bop_token_id] = 3.0 * h0 / float(h0 @ h0)
    # feed <p>, let some ordinary token m win (the "phrase"), then point the
    # </p> row at the hidden state after [.., <p>, m]
    tsd0 = torch_vit_surgery(sd, E2E_CFG)
    toks2, hs2 = _mirror_generate(
        tsd0, ids[0, :L], tt[0, :L], pos[0, :L], torch.from_numpy(image[0]), 3
    )
    assert toks2[0] == TOK.bop_token_id
    h2 = hs2[2]  # state after feeding <p> and the phrase token
    sd["lm_head.weight"][TOK.eop_token_id] = 4.0 * h2 / float(h2 @ h2)
    cog = import_cogvlm({k: v.numpy() for k, v in sd.items()}, E2E_CFG)

    sam_sd = make_segvol_state_dict(E2E_SAM, gen)
    fresh = init_sam_params(jax.random.PRNGKey(5), E2E_SAM, instance=True)
    sam = merge_imported(fresh, import_segvol_sam(
        {k: v.numpy() for k, v in sam_sd.items()}, E2E_SAM,
        pt_in_channels=1, pt_patch_size=PT_PATCH, pt_pos_embed_shape=PT_POS,
        fresh_mask_tokens=np.asarray(fresh["decoder"]["mask_tokens"]),
    ))
    c, pd = E2E_CFG.hidden_size, E2E_SAM.embed_dim
    vg = {
        "w1": (gen.standard_normal((c, c)) * 0.2).astype(np.float32),
        "b1": (gen.standard_normal(c) * 0.1).astype(np.float32),
        "w2": (gen.standard_normal((c, pd)) * 0.2).astype(np.float32),
        "b2": (gen.standard_normal(pd) * 0.1).astype(np.float32),
    }
    params = jax.tree.map(jnp.asarray, {"cogvlm": cog, "sam": sam, "vg_proj": vg})
    cfg = MMMMConfig(vlm=E2E_CFG, sam=E2E_SAM)
    return sd, sam_sd, vg, params, cfg


def _prompts(b=2):
    gen = np.random.default_rng(3)
    lens = [16, 13]
    smax = max(lens)
    ids = np.zeros((b, smax), np.int32)
    tt = np.zeros((b, smax), np.int32)
    pos = np.zeros((b, smax), np.int32)
    for i, L in enumerate(lens):
        ids[i, :L] = gen.integers(4, 250, size=L)
        ids[i, 0] = 1  # bos
        tt[i, 1 : 1 + N_VIS] = 1
        pos[i, 1] = 1
        pos[i, 2:N_VIS] = 2
        pos[i, N_VIS] = 3
        pos[i, N_VIS + 1 : L] = 4 + np.arange(L - N_VIS - 1)
    image = gen.standard_normal((b, 3, 2, 24, 24)).astype(np.float32)
    g_image = gen.standard_normal((b, 3, 2, 24, 24)).astype(np.float32)
    return ids, tt, pos, np.asarray(lens), image, g_image


def test_e2e_grounded_pipeline_matches_torch(e2e_setup):
    sd, sam_sd, vg, params, cfg = e2e_setup
    tsd = torch_vit_surgery(sd, E2E_CFG)
    ids, tt, pos, lens, image, g_image = _prompts()
    b = ids.shape[0]

    # --- torch mirror: per-sample, unpadded ------------------------------
    want_toks, want_hid = [], []
    for i in range(b):
        L = lens[i]
        toks, hiddens = _mirror_generate(
            tsd, ids[i, :L], tt[i, :L], pos[i, :L],
            torch.from_numpy(image[i]), MAX_NEW,
        )
        want_toks.append(toks)
        want_hid.append(hiddens)
    # the biased head must actually produce a <p>...</p> span in the stream
    # (otherwise the freeze rule + eop gather are not exercised)
    flat = [t for row in want_toks for t in row]
    assert TOK.bop_token_id in flat and TOK.eop_token_id in flat
    spans = [
        (row.index(TOK.bop_token_id), row.index(TOK.eop_token_id))
        for row in want_toks if TOK.eop_token_id in row and TOK.bop_token_id in row
    ]
    assert any(e > s for s, e in spans), f"no <p>..</p> span: {want_toks}"

    # --- JAX: batched, right-padded, KV-cache decode ----------------------
    res = generate_grounded(
        params, cfg, TOK,
        jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(pos), jnp.asarray(lens),
        jnp.asarray(image), PATCH, POOL,
        max_new_tokens=MAX_NEW, max_targets=2,
        grounding_image=jnp.asarray(g_image),
        vis_span=(1, 1 + N_VIS), attn_impl="xla",
    )
    # per-step hidden states (the SAM prompt source) via the jitted generate
    # stage itself (generate_grounded consumes them internally)
    from mmmm_tpu.models.generate import greedy_generate

    gres = jax.jit(
        lambda p, a1, a2, a3, a4, im: tuple(vars(greedy_generate(
            p, E2E_CFG, a1, a2, a3, a4, image=im, max_new_tokens=MAX_NEW,
            eos_token_id=TOK.eos_token_id, bop_token_id=TOK.bop_token_id,
            eop_token_id=TOK.eop_token_id, patch_size=PATCH, pool_size=POOL,
            vis_span=(1, 1 + N_VIS), attn_impl="xla",
        )).values())
    )(
        params["cogvlm"], jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(pos),
        jnp.asarray(lens), jnp.asarray(image),
    )
    gen_tokens, gen_hidden = np.asarray(gres[0]), np.asarray(gres[1], np.float32)
    np.testing.assert_array_equal(gen_tokens, np.asarray(res.tokens))
    for i in range(b):
        n = len(want_toks[i])
        got = [int(t) for t in res.tokens[i][:n]]
        assert got == want_toks[i], f"sample {i}: {got} != {want_toks[i]}"
        for t in range(n):
            np.testing.assert_allclose(
                gen_hidden[i, t], want_hid[i][t].float().numpy(),
                atol=2e-4, rtol=1e-3,
            )

    # --- grounding: eop gather -> vg_proj -> SAM mask logits --------------
    assert res.masks is not None and res.target_valid is not None
    stsd = torch_segvol_surgery(sam_sd, E2E_SAM)
    mt = torch.from_numpy(np.asarray(params["sam"]["decoder"]["mask_tokens"]))
    checked = 0
    for i in range(b):
        (eops,) = np.nonzero(np.asarray(res.tokens[i]) == TOK.eop_token_id)
        eops = eops[:2]
        np.testing.assert_array_equal(res.target_valid[i, : len(eops)], True)
        t_emb = torch_segvol_encoder(
            stsd, E2E_SAM, torch.from_numpy(g_image[i : i + 1]), PATCH
        )
        pe = torch_dense_pe(stsd, t_emb.shape[2:])
        for j, e in enumerate(eops):
            h = want_hid[i][e].float()
            x = F.relu(h @ torch.from_numpy(vg["w1"]) + torch.from_numpy(vg["b1"]))
            prompt = x @ torch.from_numpy(vg["w2"]) + torch.from_numpy(vg["b2"])
            m, _ = torch_mask_decoder(stsd, E2E_SAM, t_emb[0], pe, prompt, 2, mt)
            want_mask = F.interpolate(
                m[0][None, None], g_image.shape[2:], mode="trilinear"
            )[0, 0]
            np.testing.assert_allclose(
                np.asarray(res.masks[i, j]), want_mask.numpy(), atol=5e-4, rtol=1e-3,
            )
            checked += 1
    assert checked >= 1

"""Draft-head distillation (train/draft.py): the in-repo drafter pipeline.

Trains a tiny draft head against a tiny random TEACHER and checks the
whole chain: artifact init -> assemble over the frozen shared embedding ->
distill steps improve teacher-argmax agreement -> save/load round-trip ->
the assembled tree drives llama.draft_speculative_decode_loop with
token-identical greedy output.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from minigpt4_tpu.models import llama as llama_mod
from minigpt4_tpu.train import draft as D

TCFG = llama_mod.LlamaConfig(n_vocab=128, n_embd=64, n_head=2, n_layer=2,
                             n_rot=32, n_ff=128, n_ctx=64)


def _teacher(key):
    ks = jax.random.split(key, 8)
    d, ff, L, v = TCFG.n_embd, TCFG.n_ff, TCFG.n_layer, TCFG.n_vocab

    def nrm(k, *s, sc=0.05):
        return jax.random.normal(k, s, jnp.float32) * sc

    return {
        "tok_embeddings": nrm(ks[0], v, d, sc=0.5),
        "norm": jnp.ones((d,)),
        "output": {"w": nrm(ks[1], d, v, sc=0.5)},
        "layers": {
            "attention_norm": jnp.ones((L, d)),
            "wqkv": {"w": nrm(ks[2], L, d, 3 * d)},
            "wo": {"w": nrm(ks[3], L, d, d)},
            "ffn_norm": jnp.ones((L, d)),
            "w13": {"w": nrm(ks[4], L, d, 2 * ff)},
            "w2": {"w": nrm(ks[5], L, ff, d)},
        },
    }


def test_distill_improves_agreement_and_integrates(tmp_path):
    key = jax.random.PRNGKey(0)
    teacher = _teacher(key)
    dhc = D.DraftHeadConfig(d_draft=32, n_layer=1, n_head=2, n_ff=64)
    dcfg = dhc.llama_cfg(TCFG.n_vocab, TCFG.n_ctx)
    art = D.init_draft_head(jax.random.PRNGKey(1), TCFG.n_embd, dhc)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, TCFG.n_vocab, (8, 32)), jnp.int32)
    targets = D.teacher_targets(teacher, TCFG, toks, cache_dtype=jnp.float32)

    opt = optax.adamw(3e-3)
    emb = teacher["tok_embeddings"]
    step = D.make_distill_step(dcfg, opt)
    st = opt.init(art)
    _, _, loss0, acc0 = step(art, st, emb, toks, targets, 4)
    losses = []
    for _ in range(60):
        art, st, loss, acc = step(art, st, emb, toks, targets, 4)
        losses.append(float(loss))
    assert losses[-1] < float(loss0) * 0.7, (float(loss0), losses[-1])
    assert float(acc) > float(acc0), (float(acc0), float(acc))

    # save/load round-trip (f16 quantizes the artifact: allow tolerance)
    p = tmp_path / "draft.npz"
    D.save_artifact(p, art, dhc)
    art2, dhc2 = D.load_artifact(p)
    assert dhc2 == dhc
    d1 = D.assemble_draft(teacher["tok_embeddings"], art)
    d2 = D.assemble_draft(teacher["tok_embeddings"], art2)
    a = np.asarray(d1["output"]["w"], np.float32)
    b = np.asarray(d2["output"]["w"], np.float32)
    assert np.abs(a - b).max() < 2e-2 * max(1.0, np.abs(a).max())

    # the assembled tree drives the engine's draft loop; greedy output must
    # equal plain greedy decode regardless of drafter quality
    dparams = D.assemble_draft(teacher["tok_embeddings"], art, jnp.float32)
    cache = llama_mod.init_cache(TCFG, batch=1, dtype=jnp.float32)
    dcache = llama_mod.init_cache(dcfg, batch=1, dtype=jnp.float32)
    prompt = toks[:1, :8]
    emb = llama_mod.embed_tokens(teacher, prompt)
    logits, cache = llama_mod.forward(teacher, cache, emb, jnp.int32(0), TCFG,
                                      use_flash=False)
    demb = llama_mod.embed_tokens(dparams, prompt)
    _, dcache = llama_mod.forward(dparams, dcache, demb, jnp.int32(0), dcfg,
                                  use_flash=False)
    toks_sp, counts, _, _, _ = llama_mod.draft_speculative_decode_loop(
        teacher, cache, dparams, dcache, logits, jnp.int32(8), 3, 4, TCFG,
        dcfg, use_flash=False,
    )
    # plain greedy reference
    cache2 = llama_mod.init_cache(TCFG, batch=1, dtype=jnp.float32)
    logits2, cache2 = llama_mod.forward(teacher, cache2, emb, jnp.int32(0),
                                        TCFG, use_flash=False)
    got = []
    pos = 8
    for tsp, cnt in zip(np.asarray(toks_sp)[0], np.asarray(counts)[0]):
        got += [int(t) for t in tsp[:cnt]]
    want = []
    lg = logits2
    for _ in range(len(got)):
        t = int(jnp.argmax(lg[0]))
        want.append(t)
        e = llama_mod.embed_tokens(teacher, jnp.asarray([[t]], jnp.int32))
        lg, cache2 = llama_mod.forward(teacher, cache2, e, jnp.int32(pos),
                                       TCFG, use_flash=False)
        pos += 1
    assert got == want, (got, want)

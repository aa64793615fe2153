"""Speculative decoding tests: medusa heads, eagle draft, acceptance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.speculative import eagle, medusa


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    return cfg, params, tokens


def test_medusa_logit_shapes(tiny):
    cfg, params, tokens = tiny
    mcfg = medusa.MedusaConfig(num_heads=3)
    heads = medusa.init_medusa(cfg, mcfg, jax.random.PRNGKey(1))
    base, hl = medusa.medusa_logits(cfg, params, heads, tokens)
    assert base.shape == (2, 16, cfg.vocab_size)
    assert hl.shape == (3, 2, 16, cfg.vocab_size)


def test_medusa_training_reduces_loss(tiny):
    cfg, params, tokens = tiny
    mcfg = medusa.MedusaConfig(num_heads=2)
    heads = medusa.init_medusa(cfg, mcfg, jax.random.PRNGKey(2))
    step = jax.jit(medusa.make_medusa_train_step(cfg, lr=5e-2))
    heads, l0 = step(heads, params, tokens)
    for _ in range(5):
        heads, l = step(heads, params, tokens)
    assert float(l) < float(l0)


def test_medusa_propose_verify(tiny):
    cfg, params, tokens = tiny
    mcfg = medusa.MedusaConfig(num_heads=2)
    heads = medusa.init_medusa(cfg, mcfg, jax.random.PRNGKey(3))
    out, rate = medusa.propose_and_verify(cfg, params, heads, tokens[:1, :8], steps=6)
    assert out.shape[1] >= 8 + 6
    assert 0.0 <= rate <= 1.0
    # verified tokens must match pure greedy decoding of the base model
    greedy = tokens[:1, :8]
    for _ in range(out.shape[1] - 8):
        logits, _, _ = llama.forward(cfg, params, greedy)
        nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        greedy = jnp.concatenate([greedy, nxt.astype(jnp.int32)], axis=1)
    n = min(greedy.shape[1], out.shape[1])
    np.testing.assert_array_equal(np.asarray(out[:, :n]), np.asarray(greedy[:, :n]))


def test_eagle_training_reduces_loss(tiny):
    cfg, params, tokens = tiny
    ecfg = eagle.EagleConfig(num_layers=1)
    draft = eagle.init_eagle(cfg, ecfg, jax.random.PRNGKey(4))
    step = jax.jit(eagle.make_eagle_train_step(cfg, lr=2e-2))
    draft, l0 = step(draft, params, tokens)
    for _ in range(5):
        draft, l = step(draft, params, tokens)
    assert float(l) < float(l0)


def test_medusa_export_roundtrip(tiny, tmp_path):
    from tensorrt_model_optimizer_tpu.export import spec_export

    cfg, params, tokens = tiny
    mcfg = medusa.MedusaConfig(num_heads=2)
    heads = medusa.init_medusa(cfg, mcfg, jax.random.PRNGKey(5))
    out = str(tmp_path / "medusa")
    info = spec_export.export_medusa(heads, cfg, out)
    assert info["num_medusa_heads"] == 2
    loaded = spec_export.load_medusa(out)
    b0, h0 = medusa.medusa_logits(cfg, params, heads, tokens[:1, :8])
    b1, h1 = medusa.medusa_logits(cfg, params, loaded, tokens[:1, :8])
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=1e-5, atol=1e-5)


def test_eagle_export(tiny, tmp_path):
    from tensorrt_model_optimizer_tpu.export import spec_export

    cfg, params, tokens = tiny
    draft = eagle.init_eagle(cfg, eagle.EagleConfig(), jax.random.PRNGKey(6))
    info = spec_export.export_eagle(draft, cfg, str(tmp_path / "eagle"))
    assert info["speculative_algo"] == "EAGLE"
    import os
    assert os.path.exists(tmp_path / "eagle" / "eagle_draft.safetensors")


def test_dflash_training_reduces_loss(tiny):
    from tensorrt_model_optimizer_tpu.speculative import dflash

    cfg, params, tokens = tiny
    dcfg = dflash.DFlashConfig(block_size=3)
    draft = dflash.init_dflash(cfg, dcfg, jax.random.PRNGKey(7))
    step = jax.jit(dflash.make_dflash_train_step(cfg, dcfg, lr=2e-2))
    draft, l0 = step(draft, params, tokens)
    for _ in range(5):
        draft, l = step(draft, params, tokens)
    assert float(l) < float(l0)


def test_dflash_hard_label_mode(tiny):
    from tensorrt_model_optimizer_tpu.speculative import dflash

    cfg, params, tokens = tiny
    dcfg = dflash.DFlashConfig(block_size=2, self_logit_distillation=False)
    draft = dflash.init_dflash(cfg, dcfg, jax.random.PRNGKey(8))
    step = jax.jit(dflash.make_dflash_train_step(cfg, dcfg))
    draft, loss = step(draft, params, tokens)
    assert np.isfinite(float(loss))


def test_dflash_propose_verify(tiny):
    from tensorrt_model_optimizer_tpu.speculative import dflash

    cfg, params, tokens = tiny
    dcfg = dflash.DFlashConfig(block_size=2)
    draft = dflash.init_dflash(cfg, dcfg, jax.random.PRNGKey(9))
    out, rate = dflash.propose_and_verify(cfg, params, draft, tokens[:1, :8], steps=5)
    assert out.shape[1] >= 13 and 0.0 <= rate <= 1.0
    # verified output == pure greedy
    greedy = tokens[:1, :8]
    for _ in range(out.shape[1] - 8):
        lg, _, _ = llama.forward(cfg, params, greedy)
        greedy = jnp.concatenate(
            [greedy, jnp.argmax(lg[:, -1], axis=-1)[:, None].astype(jnp.int32)], axis=1)
    n = min(out.shape[1], greedy.shape[1])
    np.testing.assert_array_equal(np.asarray(out[:, :n]), np.asarray(greedy[:, :n]))


class TestTreeAttention:
    def test_tree_topology_and_mask(self):
        from tensorrt_model_optimizer_tpu.speculative import tree as T

        t = T.build_tree([[0], [1], [0, 0], [0, 1], [1, 0], [0, 0, 0]])
        assert t.n_nodes == 7
        assert t.depth == (0, 1, 1, 2, 2, 2, 3)
        m = t.attn_mask
        # every node attends to itself and the base token
        assert m.diagonal().all() and m[:, 0].all()
        # node [0,0,0] (last, BFS) attends to chain 0 -> [0] -> [0,0]
        import numpy as np

        last = t.n_nodes - 1
        chain = {last}
        p = t.parent[last]
        while p >= 0:
            chain.add(p)
            p = t.parent[p]
        assert set(np.nonzero(m[last])[0]) == chain

    def test_tree_verify_matches_chain_greedy(self):
        """Tree decode must produce the SAME tokens as plain greedy decode
        (speculation changes speed, never the distribution)."""
        from tensorrt_model_optimizer_tpu.speculative import medusa as M
        from tensorrt_model_optimizer_tpu.speculative import tree as T

        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        mcfg = M.MedusaConfig(num_heads=3)
        med = M.init_medusa(cfg, mcfg, jax.random.PRNGKey(1))
        prompt = jnp.asarray([[5, 9, 2, 7]], jnp.int32)

        out, rate = T.tree_propose_and_verify(cfg, params, med, prompt, steps=8)
        # plain greedy reference
        toks = prompt
        n_new = out.shape[1] - prompt.shape[1]
        for _ in range(n_new):
            lg, _, _ = llama.forward(cfg, params, toks)
            toks = jnp.concatenate(
                [toks, jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)], axis=1
            )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(toks))
        assert 0.0 <= rate <= 1.0


class TestEagleTTT:
    def test_ttt_mask_semantics(self):
        from tensorrt_model_optimizer_tpu.speculative import eagle as E

        T, steps = 4, 3
        m1 = np.asarray(E.ttt_attention_mask(T, 1, steps * T))[0, 0]
        # step 1: query q sees orig kv <= q-1 and exactly kv == q+T in block 1
        q = 2
        allowed = set(np.nonzero(m1[q] == 0.0)[0])
        assert allowed == {0, 1, q + T}
        # step 0 must be plain causal over block 0
        m0 = np.asarray(E.ttt_attention_mask(T, 0, steps * T))[0, 0]
        for qq in range(T):
            assert set(np.nonzero(m0[qq] == 0.0)[0]) == set(range(qq + 1))

    def test_ttt_training_learns(self):
        from tensorrt_model_optimizer_tpu.speculative import eagle as E

        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = E.EagleConfig()
        draft = E.init_eagle(cfg, ecfg, jax.random.PRNGKey(1))
        toks = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))
        step = jax.jit(E.make_eagle_ttt_train_step(cfg, ttt_steps=2, lr=5e-3))
        draft, l0, accs = step(draft, params, toks)
        assert accs.shape == (2,)
        for _ in range(10):
            draft, loss, accs = step(draft, params, toks)
        assert float(loss) < float(l0)


class TestEagle3:
    """EAGLE-3 multi-layer feature taps (reference hf_eagle.py aux hiddens)."""

    def test_default_aux_layers(self):
        from tensorrt_model_optimizer_tpu.speculative import eagle

        assert eagle.default_aux_layer_ids(32) == [1, 15, 28]
        assert eagle.default_aux_layer_ids(4) == [0, 1]

    def test_aux_capture_and_fuse(self, tiny):
        from tensorrt_model_optimizer_tpu.speculative import eagle

        cfg, params, tokens = tiny
        ids = eagle.default_aux_layer_ids(cfg.num_hidden_layers)
        aux = eagle.aux_hidden_states(cfg, params, tokens, ids)
        assert aux.shape == (*tokens.shape, len(ids) * cfg.hidden_size)
        e3 = eagle.init_eagle3(cfg, eagle.EagleConfig(), jax.random.key(5))
        fused = eagle.eagle3_fuse(e3, aux)
        assert fused.shape == (*tokens.shape, cfg.hidden_size)
        assert np.isfinite(np.asarray(fused)).all()

    def test_eagle3_ttt_training_improves(self, tiny):
        from tensorrt_model_optimizer_tpu.speculative import eagle

        cfg, params, tokens = tiny
        e3 = eagle.init_eagle3(cfg, eagle.EagleConfig(), jax.random.key(5))
        step = jax.jit(eagle.make_eagle3_ttt_train_step(cfg, ttt_steps=2, lr=1e-2))
        e3b, loss0, _ = step(e3, params, tokens)
        for _ in range(30):
            e3b, loss, _ = step(e3b, params, tokens)
        assert float(loss) < float(loss0)
        # aux layer ids survive training untouched
        assert e3b["aux_layer_ids"] == e3["aux_layer_ids"]

    def test_eagle3_acceptance_harness(self, tiny):
        from tensorrt_model_optimizer_tpu.speculative import eagle

        cfg, params, tokens = tiny
        e3 = eagle.init_eagle3(cfg, eagle.EagleConfig(), jax.random.key(5))
        out, rate = eagle.propose_and_verify(
            cfg, params, e3, tokens[:1, :8], steps=8, draft_len=2
        )
        assert out.shape[1] >= 8 + 8
        assert 0.0 <= rate <= 1.0

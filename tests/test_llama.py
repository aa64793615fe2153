"""Llama model tests: forward, quant injection, calibration, cache, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import get_preset


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def tokens():
    return jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(2, 16)))


class TestForward:
    def test_plain_forward(self, tiny, tokens):
        cfg, params = tiny
        logits, qs, cache = llama.forward(cfg, params, tokens)
        assert logits.shape == (2, 16, cfg.vocab_size)
        assert qs is None and cache is None
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_causality(self, tiny, tokens):
        cfg, params = tiny
        logits1, _, _ = llama.forward(cfg, params, tokens)
        perturbed = tokens.at[:, -1].set((tokens[:, -1] + 1) % 256)
        logits2, _, _ = llama.forward(cfg, params, perturbed)
        np.testing.assert_allclose(
            np.asarray(logits1[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-5
        )
        assert not np.allclose(np.asarray(logits1[:, -1]), np.asarray(logits2[:, -1]))

    def test_jit_forward(self, tiny, tokens):
        cfg, params = tiny
        f = jax.jit(lambda p, t: llama.forward(cfg, p, t)[0])
        logits = f(params, tokens)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestCalibrateQuantize:
    def test_max_calibration_collects(self, tiny, tokens):
        cfg, params = tiny
        layout = llama.build_layout(cfg, get_preset("INT8_DEFAULT_CFG"))
        qs = llama.init_quant_state(cfg, layout)
        logits, qs2, _ = llama.forward(
            cfg, params, tokens, layout=layout, qstate=qs, calib=True
        )
        w_amax = qs2["self_attn.q_proj"]["weight"].amax
        assert w_amax.shape[0] == cfg.num_hidden_layers
        assert np.all(np.asarray(w_amax) > 0)
        in_amax = qs2["self_attn.q_proj"]["input"].amax
        assert np.all(np.asarray(in_amax) > 0)

    @pytest.mark.parametrize(
        "preset,min_corr",
        [("INT8_DEFAULT_CFG", 0.99), ("FP8_DEFAULT_CFG", 0.99),
         ("NVFP4_DEFAULT_CFG", 0.85), ("INT4_BLOCKWISE_WEIGHT_ONLY_CFG", 0.90),
         ("W4A8_AWQ_BETA_CFG", 0.90), ("MXFP4_DEFAULT_CFG", 0.80),
         ("FP8_KV_CFG", 0.98)],
    )
    def test_ptq_roundtrip(self, tiny, tokens, preset, min_corr):
        """Calibrate then quantized forward: finite logits, bounded error.

        W4A4 thresholds are loose: a tiny random-init model has no outlier
        structure, the worst case for 4-bit blocks.
        """
        cfg, params = tiny
        layout = llama.build_layout(cfg, get_preset(preset))
        qs = llama.init_quant_state(cfg, layout)
        _, qs, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
        ref, _, _ = llama.forward(cfg, params, tokens)
        qlogits, _, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs)
        assert np.all(np.isfinite(np.asarray(qlogits)))
        # Quantized logits should correlate strongly with bf16 logits
        a = np.asarray(ref).ravel()
        b = np.asarray(qlogits).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > min_corr, f"{preset}: corr={corr}"

    def test_quantized_changes_logits(self, tiny, tokens):
        cfg, params = tiny
        layout = llama.build_layout(cfg, get_preset("INT4_BLOCKWISE_WEIGHT_ONLY_CFG"))
        qs = llama.init_quant_state(cfg, layout)
        _, qs, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
        ref, _, _ = llama.forward(cfg, params, tokens)
        qlogits, _, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs)
        assert not np.allclose(np.asarray(ref), np.asarray(qlogits))

    def test_calib_preserves_logits(self, tiny, tokens):
        """Calibration forward runs unquantized (identical logits)."""
        cfg, params = tiny
        layout = llama.build_layout(cfg, get_preset("INT8_DEFAULT_CFG"))
        qs = llama.init_quant_state(cfg, layout)
        ref, _, _ = llama.forward(cfg, params, tokens)
        cal, _, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(cal), atol=1e-6)


class TestKVCache:
    def test_incremental_matches_full(self, tiny, tokens):
        cfg, params = tiny
        full, _, _ = llama.forward(cfg, params, tokens)
        cache = llama.init_cache(cfg, batch=2, max_len=32)
        # prefill first 12, then decode 4 one at a time
        logits, _, cache = llama.forward(cfg, params, tokens[:, :12], cache=cache)
        np.testing.assert_allclose(
            np.asarray(full[:, 11]), np.asarray(logits[:, -1]), rtol=2e-3, atol=2e-3
        )
        for t in range(12, 16):
            logits, _, cache = llama.forward(cfg, params, tokens[:, t : t + 1], cache=cache)
            np.testing.assert_allclose(
                np.asarray(full[:, t]), np.asarray(logits[:, 0]), rtol=2e-3, atol=2e-3
            )

    def test_quantized_kv_decode(self, tiny, tokens):
        cfg, params = tiny
        layout = llama.build_layout(cfg, get_preset("FP8_KV_CFG"))
        qs = llama.init_quant_state(cfg, layout)
        _, qs, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
        cache = llama.init_cache(cfg, batch=2, max_len=32)
        logits, _, cache = llama.forward(
            cfg, params, tokens, layout=layout, qstate=qs, cache=cache
        )
        assert np.all(np.isfinite(np.asarray(logits)))
        assert int(cache["pos"]) == 16


class TestSharding:
    def test_sharded_forward_matches(self, tiny, tokens, mesh8):
        cfg, params = tiny
        specs = llama.param_specs(cfg)
        flat_specs = {
            "embed_tokens": specs["embed_tokens"],
            "norm": specs["norm"],
            "lm_head": specs["lm_head"],
        }
        sharded = dict(params)
        sharded["layers"] = {
            k: jax.device_put(v, NamedSharding(mesh8, specs["layers"][k]))
            for k, v in params["layers"].items()
        }
        for k, spec in flat_specs.items():
            sharded[k] = jax.device_put(params[k], NamedSharding(mesh8, spec))
        ref, _, _ = llama.forward(cfg, params, tokens)
        with jax.set_mesh(mesh8):
            out, _, _ = jax.jit(lambda p, t: llama.forward(cfg, p, t))(sharded, tokens)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-4)

    def test_sharded_calibration_amax_syncs(self, tiny, tokens, mesh8):
        """amax collected under TP sharding equals single-device amax (the
        GSPMD equivalent of model_calib.py:408-498 TP sync)."""
        cfg, params = tiny
        layout = llama.build_layout(cfg, get_preset("INT8_DEFAULT_CFG"))
        qs = llama.init_quant_state(cfg, layout)
        _, qs_ref, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
        specs = llama.param_specs(cfg)
        sharded = dict(params)
        sharded["layers"] = {
            k: jax.device_put(v, NamedSharding(mesh8, specs["layers"][k]))
            for k, v in params["layers"].items()
        }
        with jax.set_mesh(mesh8):
            _, qs_sh, _ = jax.jit(
                lambda p, t, q: llama.forward(cfg, p, t, layout=layout, qstate=q, calib=True)
            )(sharded, tokens, qs)
        a = np.asarray(qs_ref["self_attn.q_proj"]["weight"].amax)
        b = np.asarray(qs_sh["self_attn.q_proj"]["weight"].amax)
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestFlashAttnImpl:
    def test_flash_matches_einsum_forward(self):
        import dataclasses

        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        toks = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
        ref, _, _ = llama.forward(cfg, params, toks)
        fcfg = dataclasses.replace(cfg, attn_impl="flash")
        out, _, _ = llama.forward(fcfg, params, toks)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_flash_differentiable(self):
        import dataclasses

        cfg = dataclasses.replace(llama.LlamaConfig.tiny(), attn_impl="flash")
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        toks = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)))

        def loss(p):
            logits, _, _ = llama.forward(cfg, p, toks)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params)
        gn = float(jnp.linalg.norm(g["layers"]["self_attn.q_proj"].astype(jnp.float32)))
        assert np.isfinite(gn) and gn > 0


def test_quant_embedding_site():
    """QuantEmbedding: enabling *embed* quantizes the token table."""
    import dataclasses

    from tensorrt_model_optimizer_tpu.quant import get_preset
    from tensorrt_model_optimizer_tpu.quant.config import INT8_PER_CHANNEL

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)))
    qcfg = get_preset("INT8_DEFAULT_CFG").with_rules(
        {"*embed_tokens*": INT8_PER_CHANNEL})
    layout = llama.build_layout(cfg, qcfg)
    assert layout.get("embed_tokens.weight").enable
    # calibrate then run: embedding amax collected and applied
    _, qs, _ = llama.forward(cfg, params, toks, layout=layout,
                             qstate=llama.init_quant_state(cfg, layout),
                             calib=True)
    assert qs["embed_tokens.weight"].amax is not None
    out_q, _, _ = llama.forward(cfg, params, toks, layout=layout, qstate=qs)
    out_ref, _, _ = llama.forward(cfg, params, toks)
    corr = np.corrcoef(np.asarray(out_q).ravel(), np.asarray(out_ref).ravel())[0, 1]
    assert 0.9 < corr < 1.0 - 1e-9  # quantized but close
    # default presets keep embeddings DISABLED (the reference exclusion)
    lay_def = llama.build_layout(cfg, get_preset("INT8_DEFAULT_CFG"))
    assert not lay_def.get("embed_tokens.weight").enable

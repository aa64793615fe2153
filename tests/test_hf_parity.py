"""Parity against Hugging Face transformers: identical tiny checkpoint,
logits must match. Pins down RoPE/GQA/RMSNorm conventions exactly."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("hf_tiny")
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


def test_logits_match_transformers(hf_ckpt):
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama

    path, hf_model = hf_ckpt
    cfg, params = hf_loader.load_hf_checkpoint(path, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    ours, _, _ = llama.forward(cfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_quantized_hf_model_runs(hf_ckpt):
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader
    from tensorrt_model_optimizer_tpu.quant import ptq

    path, _ = hf_ckpt
    cfg, params = hf_loader.load_hf_checkpoint(path, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 128, size=(2, 12)))]
    model = ptq.quantize(cfg, params, "FP8_DEFAULT_CFG", batches)
    logits, _, _ = model.forward(batches[0])
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.fixture(scope="module")
def qwen_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("qwen_tiny")
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


def test_qwen2_logits_match(qwen_ckpt):
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama

    path, hf_model = qwen_ckpt
    cfg, params = hf_loader.load_hf_checkpoint(path, dtype=jnp.float32)
    assert cfg.attention_bias
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    ours, _, _ = llama.forward(cfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_qwen2_ptq_and_serve(qwen_ckpt, tmp_path):
    """Qwen2 (attention biases): full PTQ -> export -> engine loop."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.export import hf_export
    from tensorrt_model_optimizer_tpu.models import hf_loader
    from tensorrt_model_optimizer_tpu.quant import compress, ptq
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine

    path, _ = qwen_ckpt
    cfg, params = hf_loader.load_hf_checkpoint(path, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    batches = [jnp.asarray(rng.integers(0, 128, size=(2, 12)))]
    model = ptq.quantize(cfg, params, "INT8_DEFAULT_CFG", batches)
    logits, _, _ = model.forward(batches[0])
    assert np.all(np.isfinite(np.asarray(logits)))
    hf_export.export_hf_checkpoint(model, str(tmp_path / "qwen_q"))
    cm = compress.compress(model)
    eng = serve_engine.Engine(cm, serve_engine.EngineConfig(max_seq_len=32, backend="xla"))
    prompt = batches[0][:, :6]
    el, _ = eng.prefill(prompt, eng.init_cache(2, 32))
    ref2, _, _ = model.forward(prompt)
    corr = np.corrcoef(np.asarray(el).ravel(), np.asarray(ref2[:, -1]).ravel())[0, 1]
    assert corr > 0.99, f"engine dropped biases? corr={corr}"
    out = eng.generate(prompt, max_new_tokens=3)
    assert out.shape == (2, 3)


@pytest.fixture(scope="module")
def llama31_ckpt(tmp_path_factory):
    """Tiny llama with llama-3.1 rope scaling (factor 4 over 64 positions)."""
    path = tmp_path_factory.mktemp("hf_31")
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        rope_scaling={
            "rope_type": "llama3", "factor": 4.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 64,
        },
    )
    torch.manual_seed(2)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


def test_llama31_rope_scaling_logits_match(llama31_ckpt):
    """Positions beyond original_max exercise the scaled frequency band."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama

    path, hf_model = llama31_ckpt
    cfg, params = hf_loader.load_hf_checkpoint(path, dtype=jnp.float32)
    assert cfg.rope_scaling is not None and cfg.rope_scaling.factor == 4.0
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, size=(1, 100))  # > original_max=64
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    ours, _, _ = llama.forward(cfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_llama31_rope_scaling_matters(llama31_ckpt):
    """Dropping the scaling must change long-position logits (guards against
    the scaling being silently ignored)."""
    import dataclasses

    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama

    path, _ = llama31_ckpt
    cfg, params = hf_loader.load_hf_checkpoint(path, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 128, size=(1, 100)))
    scaled, _, _ = llama.forward(cfg, params, tokens)
    unscaled, _, _ = llama.forward(
        dataclasses.replace(cfg, rope_scaling=None), params, tokens
    )
    assert np.abs(np.asarray(scaled) - np.asarray(unscaled)).max() > 1e-3


@pytest.fixture(scope="module")
def qwen3_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("hf_qwen3")
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=24, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen3ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


def test_qwen3_logits_match_transformers(qwen3_ckpt):
    """Qwen3 per-head q/k RMS norm + explicit head_dim parity."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama

    path, hf_model = qwen3_ckpt
    cfg, params = hf_loader.load_hf_checkpoint(path, dtype=jnp.float32)
    assert cfg.qk_norm and cfg.hd == 24
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    ours, _, _ = llama.forward(cfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_qwen3_moe_logits_match_transformers(tmp_path_factory):
    """Qwen3-MoE fused-expert checkpoint loads into the stacked-expert
    layout and matches transformers' token-choice routing."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, mixtral

    path = tmp_path_factory.mktemp("hf_qwen3moe")
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = transformers.Qwen3MoeForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)

    mcfg, params = hf_loader.load_hf_moe_checkpoint(str(path), dtype=jnp.float32)
    assert mcfg.num_experts == 4 and mcfg.intermediate_size == 48
    # full capacity so no tokens drop (HF has no capacity limit)
    import dataclasses
    mcfg = dataclasses.replace(mcfg, capacity_factor=float(mcfg.num_experts))
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 128, size=(2, 10))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    ours, _ = mixtral.forward(mcfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_gpt_oss_logits_match_transformers(tmp_path_factory):
    """GPT-OSS: fused clamped-swiglu experts with biases, attention sinks,
    yarn rope, alternating sliding/full attention — logits parity."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import gpt_oss, hf_loader

    path = tmp_path_factory.mktemp("hf_gptoss")
    cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48,
        num_local_experts=4, num_experts_per_tok=2,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        sliding_window=4,  # < T so the sliding layer actually differs
        attention_bias=True,
        rope_scaling={
            "rope_type": "yarn", "factor": 8.0, "beta_fast": 32.0,
            "beta_slow": 1.0, "truncate": False,
            "original_max_position_embeddings": 16,
        },
    )
    torch.manual_seed(3)
    model = transformers.GptOssForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)

    gcfg, params = hf_loader.load_hf_moe_checkpoint(str(path), dtype=jnp.float32)
    assert gcfg.num_experts == 4 and gcfg.sliding_window == 4
    assert gcfg.resolved_layer_types()[0] == "sliding_attention"
    assert gcfg.rope_scaling is not None and gcfg.rope_scaling.rope_type == "yarn"
    # full capacity so no tokens drop (HF has no capacity limit)
    import dataclasses
    gcfg = dataclasses.replace(gcfg, capacity_factor=float(gcfg.num_experts))
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    ours, _ = gpt_oss.forward(gcfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_gpt_oss_ptq_runs(tmp_path_factory):
    """GPT-OSS family: calibrate + quantize through its MoE layout."""
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import gpt_oss
    from tensorrt_model_optimizer_tpu.quant import get_preset

    cfg = gpt_oss.GptOssConfig.tiny()
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(0))
    layout = gpt_oss.build_layout(cfg, get_preset("NVFP4_DEFAULT_CFG"))
    assert layout.get("moe.gate_proj.weight").enable
    qs = gpt_oss.init_quant_state(cfg, layout)
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    _, qs = gpt_oss.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    assert np.all(np.asarray(qs["moe.gate_proj"]["weight"].amax) > 0)
    ref, _ = gpt_oss.forward(cfg, params, tokens)
    ql, _ = gpt_oss.forward(cfg, params, tokens, layout=layout, qstate=qs)
    assert np.all(np.isfinite(np.asarray(ql)))
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(ql).ravel())[0, 1]
    assert corr > 0.8


def test_dbrx_logits_match_transformers(tmp_path_factory):
    """DBRX: fused Wqkv + clip_qkv, LayerNorm blocks, fused GLU experts,
    softmax-then-topk routing with p=1 renorm — logits parity."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, mixtral

    path = tmp_path_factory.mktemp("hf_dbrx")
    cfg = transformers.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=128, vocab_size=128,
        attn_config={"kv_n_heads": 2, "clip_qkv": 4.0, "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0},
        tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    model = transformers.DbrxForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)

    mcfg, params = hf_loader.load_hf_moe_checkpoint(str(path), dtype=jnp.float32)
    assert mcfg.norm_type == "layernorm" and mcfg.clip_qkv == 4.0
    assert mcfg.num_experts == 4 and mcfg.intermediate_size == 48
    import dataclasses
    mcfg = dataclasses.replace(mcfg, capacity_factor=float(mcfg.num_experts))
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    ours, _ = mixtral.forward(mcfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_llama4_logits_match_transformers(tmp_path_factory):
    """Llama4 (Scout-style all-MoE): interleaved rope, nope layers with
    temperature tuning, L2 qk-norm, chunked attention, sigmoid input-scaled
    routing + shared expert — logits parity."""
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import hf_loader, llama4

    path = tmp_path_factory.mktemp("hf_llama4")
    cfg = transformers.Llama4TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48,
        intermediate_size_mlp=96, num_local_experts=4, num_experts_per_tok=2,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_chunk_size=4,  # < T so rope layers actually chunk
        floor_scale=4.0, attn_scale=0.1, attn_temperature_tuning=True,
        use_qk_norm=True, interleave_moe_layer_step=1,
    )
    torch.manual_seed(5)
    model = transformers.Llama4ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)

    lcfg, params = hf_loader.load_hf_moe_checkpoint(str(path), dtype=jnp.float32)
    assert lcfg.num_experts == 4 and lcfg.attention_chunk_size == 4
    assert lcfg.use_rope_layers() == (True, True, True, False)
    import dataclasses
    lcfg = dataclasses.replace(lcfg, capacity_factor=float(lcfg.num_experts))
    rng = np.random.default_rng(8)
    tokens = rng.integers(0, 128, size=(2, 12))  # T > chunk and > floor
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    ours, _ = llama4.forward(lcfg, params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_llama4_ptq_runs():
    """Llama4 family: calibrate + quantize through its layout (MoE +
    shared-expert sites)."""
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama4
    from tensorrt_model_optimizer_tpu.quant import get_preset

    cfg = llama4.Llama4Config.tiny()
    params = llama4.init_params(cfg, jax.random.PRNGKey(0))
    layout = llama4.build_layout(cfg, get_preset("NVFP4_DEFAULT_CFG"))
    assert layout.get("shared.gate_proj.weight").enable
    qs = llama4.init_quant_state(cfg, layout)
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    _, qs = llama4.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    assert np.all(np.asarray(qs["shared.gate_proj"]["weight"].amax) > 0)
    assert np.all(np.asarray(qs["moe.gate_proj"]["weight"].amax) > 0)
    ref, _ = llama4.forward(cfg, params, tokens)
    ql, _ = llama4.forward(cfg, params, tokens, layout=layout, qstate=qs)
    assert np.all(np.isfinite(np.asarray(ql)))
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(ql).ravel())[0, 1]
    assert corr > 0.8


def test_gpt_oss_mxfp4_checkpoint_loads(tmp_path_factory):
    """Released GPT-OSS ships MXFP4 experts ({proj}_blocks/{proj}_scales);
    the loader dequantizes them exactly like transformers'
    convert_moe_packed_tensors."""
    import jax.numpy as jnp
    from safetensors.torch import load_file, save_file

    from transformers.integrations import mxfp4 as hf_mxfp4

    from tensorrt_model_optimizer_tpu.models import gpt_oss, hf_loader

    path = tmp_path_factory.mktemp("hf_gptoss_mxfp4")
    cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=32,
        num_local_experts=2, num_experts_per_tok=2,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False, sliding_window=4,
        attention_bias=True,
    )
    torch.manual_seed(6)
    model = transformers.GptOssForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(path), safe_serialization=True)

    # re-pack the experts into mxfp4 blocks/scales with random codes
    sd = load_file(str(path) + "/model.safetensors")
    gen = torch.Generator().manual_seed(7)
    E, H, I = 2, 64, 32
    packs = {}
    for proj, contract in (("gate_up_proj", H), ("down_proj", I)):
        rows = 2 * I if proj == "gate_up_proj" else H
        blocks = torch.randint(0, 256, (E, rows, contract // 32, 16),
                               dtype=torch.uint8, generator=gen)
        scales = torch.randint(119, 133, (E, rows, contract // 32),
                               dtype=torch.uint8, generator=gen)
        deq = hf_mxfp4.convert_moe_packed_tensors(
            blocks, scales, dtype=torch.float32)
        key = f"model.layers.0.mlp.experts.{proj}"
        del sd[key]
        sd[key + "_blocks"] = blocks
        sd[key + "_scales"] = scales
        packs[proj] = deq
    save_file(sd, str(path) + "/model.safetensors")

    gcfg, params = hf_loader.load_hf_moe_checkpoint(str(path), dtype=jnp.float32)
    gate_up_ref = packs["gate_up_proj"].float().numpy()  # [E, H, 2I]
    np.testing.assert_allclose(
        np.asarray(params["layers"]["moe.gate_proj"][0]),
        np.swapaxes(gate_up_ref[..., 0::2], -1, -2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["moe.down_proj"][0]),
        np.swapaxes(packs["down_proj"].float().numpy(), -1, -2), rtol=1e-6)
    # and the model still runs
    logits, _ = gpt_oss.forward(gcfg, params, jnp.zeros((1, 8), jnp.int32))
    assert np.all(np.isfinite(np.asarray(logits)))

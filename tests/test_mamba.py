"""Hybrid Mamba2 model: SSD numerics, cache parity, PTQ, pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import mamba


@pytest.fixture(scope="module")
def tiny():
    cfg = mamba.MambaConfig.tiny()
    params = mamba.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, cfg.vocab_size)
    return cfg, params, tokens


def test_ssd_matches_recurrence():
    """Chunked SSD == naive per-step state recurrence."""
    key = jax.random.PRNGKey(2)
    B, T, H, P, G, N = 2, 13, 4, 8, 2, 16
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (B, T, H, P), jnp.float32)
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, T, H), jnp.float32))
    A = -jnp.exp(jax.random.normal(ks[2], (H,), jnp.float32) * 0.3)
    Bm = jax.random.normal(ks[3], (B, T, G, N), jnp.float32) * 0.5
    Cm = jax.random.normal(jax.random.fold_in(key, 9), (B, T, G, N), jnp.float32) * 0.5

    y, final = mamba._ssd(x, dt, A, Bm, Cm, chunk=4)

    rep = H // G
    h = np.zeros((B, H, P, N), np.float64)
    ys = np.zeros((B, T, H, P), np.float64)
    xn, dtn, An = np.asarray(x, np.float64), np.asarray(dt, np.float64), np.asarray(A, np.float64)
    Bn = np.repeat(np.asarray(Bm, np.float64), rep, axis=2)
    Cn = np.repeat(np.asarray(Cm, np.float64), rep, axis=2)
    for t in range(T):
        dA = np.exp(dtn[:, t] * An[None, :])  # [B,H]
        h = h * dA[..., None, None] + (
            (dtn[:, t, :, None] * xn[:, t])[..., None] * Bn[:, t, :, None, :]
        )
        ys[:, t] = np.einsum("bhpn,bhn->bhp", h, Cn[:, t])
    np.testing.assert_allclose(np.asarray(y), ys, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(final), h, rtol=2e-4, atol=2e-4)


def test_prefill_decode_parity(tiny):
    """Full-sequence forward == chunked prefill + recurrent decode."""
    cfg, params, tokens = tiny
    full, _, _ = mamba.forward(cfg, params, tokens)

    cache = mamba.init_cache(cfg, tokens.shape[0], 32)
    logits, _, cache = mamba.forward(cfg, params, tokens[:, :20], cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), np.asarray(full[:, 19]), rtol=2e-4, atol=2e-4)
    for t in range(20, 24):
        logits, _, cache = mamba.forward(cfg, params, tokens[:, t:t + 1], cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), np.asarray(full[:, -1]), rtol=2e-4, atol=2e-4)


def test_chunked_prefill_parity(tiny):
    """Prefill in two cache chunks == one-shot prefill (SSD state handoff)."""
    cfg, params, tokens = tiny
    c1 = mamba.init_cache(cfg, tokens.shape[0], 32)
    one, _, _ = mamba.forward(cfg, params, tokens, cache=c1)
    c2 = mamba.init_cache(cfg, tokens.shape[0], 32)
    _, _, c2 = mamba.forward(cfg, params, tokens[:, :11], cache=c2)
    two, _, _ = mamba.forward(cfg, params, tokens[:, 11:], cache=c2)
    np.testing.assert_allclose(
        np.asarray(two[:, -1]), np.asarray(one[:, -1]), rtol=2e-4, atol=2e-4)


# 4-bit is looser: in_proj's dt columns feed exp(dt·A), which compounds
# over the sequence — at random init the tiny model is maximally sensitive
@pytest.mark.parametrize("preset,min_corr",
                         [("FP8_DEFAULT_CFG", 0.98), ("NVFP4_DEFAULT_CFG", 0.75)])
def test_ptq(tiny, preset, min_corr):
    cfg, params, tokens = tiny
    qm = mamba.quantize(cfg, params, preset, [tokens])
    ref, _, _ = mamba.forward(cfg, params, tokens)
    got, _, _ = qm.forward(tokens)
    assert np.all(np.isfinite(np.asarray(got)))
    # fake-quant perturbs but must stay correlated with bf16 logits
    a, b = np.asarray(got).ravel(), np.asarray(ref).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > min_corr, corr


def test_ptq_decode_cache(tiny):
    cfg, params, tokens = tiny
    qm = mamba.quantize(cfg, params, "FP8_DEFAULT_CFG", [tokens])
    full, _, _ = qm.forward(tokens)
    cache = mamba.init_cache(cfg, tokens.shape[0], 32)
    logits, _, cache = qm.forward(tokens[:, :-1], cache=cache)
    logits, _, cache = qm.forward(tokens[:, -1:], cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), np.asarray(full[:, -1]), rtol=2e-4, atol=2e-4)


def test_generate_shape(tiny):
    cfg, params, _ = tiny
    prompt = jnp.ones((2, 5), jnp.int32)
    out = mamba.generate(cfg, params, prompt, max_new_tokens=4, max_len=16)
    assert out.shape == (2, 4)


def test_tp_sharded_forward(tiny):
    """Forward + calibration under a tensor mesh matches single-device."""
    from jax.sharding import Mesh, NamedSharding

    cfg, params, tokens = tiny
    ref, _, _ = mamba.forward(cfg, params, tokens)
    devices = np.array(jax.devices()[:2])
    mesh = Mesh(devices.reshape(1, 2), axis_names=("data", "tensor"))
    specs = mamba.param_specs(cfg)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs)
    with jax.set_mesh(mesh):
        got, _, _ = jax.jit(lambda p, t: mamba.forward(cfg, p, t))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_minitron_hybrid_prune(tiny):
    """Width (mamba heads / kv / ffn / hidden) + depth pruning of the hybrid
    stack keeps a runnable, finite model and slices the right shapes."""
    from tensorrt_model_optimizer_tpu.prune import minitron_hybrid as mh

    cfg, params, tokens = tiny
    scores = mh.importance(cfg, params, [tokens])
    assert scores.mamba_head.shape == (3, cfg.mamba_num_heads)
    assert scores.kv_group.shape == (1, cfg.num_key_value_heads)

    new_cfg, new_params, plan = mh.prune(
        cfg, params, scores,
        mamba_num_heads=2, num_kv_heads=1, intermediate_size=96,
        hidden_size=48, num_blocks=4,
    )
    assert new_cfg.mamba_num_heads == 2 and new_cfg.hidden_size == 48
    assert len(new_cfg.hybrid_pattern) == 4
    assert new_params["layers_mamba"]["mixer.in_proj"].shape[1] == new_cfg.d_in_proj
    logits, _, _ = mamba.forward(new_cfg, new_params, tokens)
    assert logits.shape == (2, 24, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_minitron_hybrid_head_prune_is_exact(tiny):
    """Pruning to ALL heads/blocks (no-op targets) reproduces the model."""
    from tensorrt_model_optimizer_tpu.prune import minitron_hybrid as mh

    cfg, params, tokens = tiny
    scores = mh.importance(cfg, params, [tokens])
    new_cfg, new_params, _ = mh.prune(cfg, params, scores)
    ref, _, _ = mamba.forward(cfg, params, tokens)
    got, _, _ = mamba.forward(new_cfg, new_params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_trace_derives_mamba_groups(tiny):
    """The jaxpr tracer derives hybrid prunable-dim groups unmodified:
    mamba heads (A_log/D/dt_bias), conv channels, d_inner, ffn, hidden."""
    from tensorrt_model_optimizer_tpu.trace import trace_dim_groups

    cfg, params, _ = tiny
    res = trace_dim_groups(lambda p, t: mamba.forward(cfg, p, t)[0], params, cfg)

    def group_of(site):
        for g in res["groups"]:
            if site in g.sites:
                return g
        raise AssertionError(site)

    heads = group_of(("layers_mamba/mixer.A_log", 1))
    assert heads.size == cfg.mamba_num_heads
    assert ("layers_mamba/mixer.dt_bias", 1) in heads.sites
    conv = group_of(("layers_mamba/mixer.conv_b", 1))
    assert conv.size == cfg.conv_dim
    dinner = group_of(("layers_mamba/mixer.gnorm", 1))
    assert dinner.size == cfg.d_inner
    assert ("layers_mamba/mixer.out_proj", 2) in dinner.sites
    ffn = group_of(("layers_mlp/mlp.up_proj", 1))
    assert ffn.size == cfg.intermediate_size
    hidden = group_of(("embed_tokens", 1))
    assert hidden.size == cfg.hidden_size
    assert ("layers_mamba/mixer.in_proj", 2) in hidden.sites

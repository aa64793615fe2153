"""DeepSeek-V3-style model: MLA attention + fused MoE (BASELINE config[4]).

Covers the reference's DeepSeek PTQ surface (`examples/deepseek/deepseek_v3/
ptq.py:129` wraps ColumnParallel/RowParallel linears with quantizers; the
export handles MLA tensors in `modelopt/torch/export/plugins/mcore_deepseek.py`)
as a native functional model:

 - **MLA (multi-head latent attention)**: queries optionally low-rank
   (q_a/q_b), keys/values compressed to a `kv_lora_rank` latent + a shared
   MQA-style rope branch. The KV cache stores ONLY the latent + rope key
   ([S, r] + [S, dr] per token instead of [S, nH, 2*hd]) — the memory win
   that defines the architecture. Decode runs the *absorbed* form
   (q projected through kv_b's key half into latent space, attention done
   against the latent cache, values reconstructed after combine), which is
   mathematically identical to the naive form; `test_deepseek.py` asserts
   bit-level parity between both.
 - **MoE**: sigmoid scoring with a learned e_score_correction_bias,
   group-limited top-k routing (n_group/topk_group), routed_scaling_factor,
   plus dense shared experts — the DeepSeek-V3 router. Dispatch reuses the
   capacity-based one-hot einsum formulation from `mixtral.py` (static
   shapes, MXU-friendly, expert axis shardable over the mesh for EP).
 - First `first_k_dense_replace` layers are plain dense llama-style MLP
   layers (the real V3 has 3); they scan separately from the MoE layers so
   every `lax.scan` stays shape-uniform.

RoPE here is the repo's llama-style half-split rotation applied to the rope
branches only — self-consistent across prefill/decode/export. Real
transformers-convention checkpoints (`config.rope_interleave=True`) store
the rope rows interleaved; `hf_loader.load_hf_deepseek_checkpoint` applies
the half-split permutation at load time (parity-tested against an
interleaved synthetic checkpoint in `test_deepseek.py`).

Quant sites follow the reference wildcard naming so presets apply unchanged:
`self_attn.{q_a_proj,q_b_proj,kv_a_proj,kv_b_proj,o_proj}`, per-expert
`moe.{gate,up,down}_proj` (GroupedQuantizer analog: stacked [L, E] amax),
`shared.{gate,up,down}_proj`, and latent-cache sites `self_attn.ckv_bmm` /
`self_attn.kpe_bmm` (the MLA analog of k_bmm/v_bmm).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..quant import QuantizeConfig, QuantizerConfig, QuantizerState
from ..quant import quantizer as Q
from . import llama


@dataclasses.dataclass(frozen=True)
class DeepseekConfig(llama.LlamaConfig):
    # MLA
    q_lora_rank: int = 0  # 0 -> direct q_proj
    kv_lora_rank: int = 128
    qk_nope_head_dim: int = 32
    qk_rope_head_dim: int = 16
    v_head_dim: int = 32
    # MoE
    n_routed_experts: int = 8
    num_experts_per_tok: int = 2
    n_shared_experts: int = 1
    moe_intermediate_size: int = 64
    first_k_dense_replace: int = 1
    n_group: int = 2
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = True
    capacity_factor: float = 2.0

    @staticmethod
    def tiny(**kw) -> "DeepseekConfig":
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=128, dtype=jnp.float32,
            q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16,
            n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
            moe_intermediate_size=32, first_k_dense_replace=1,
            n_group=2, topk_group=1,
        )
        base.update(kw)
        return DeepseekConfig(**base)

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim


ATTN_NAMES = (
    "self_attn.q_a_proj", "self_attn.q_b_proj", "self_attn.q_proj",
    "self_attn.kv_a_proj", "self_attn.kv_b_proj", "self_attn.o_proj",
)
MOE_NAMES = ("moe.gate_proj", "moe.up_proj", "moe.down_proj")
SHARED_NAMES = ("shared.gate_proj", "shared.up_proj", "shared.down_proj")
DENSE_NAMES = ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj")


def _attn_shapes(cfg: DeepseekConfig) -> dict[str, tuple[int, int]]:
    h, nH = cfg.hidden_size, cfg.num_attention_heads
    dqk, dv, dr = cfg.qk_head_dim, cfg.v_head_dim, cfg.qk_rope_head_dim
    shapes = {
        "self_attn.kv_a_proj": (cfg.kv_lora_rank + dr, h),
        "self_attn.kv_b_proj": (nH * (cfg.qk_nope_head_dim + dv), cfg.kv_lora_rank),
        "self_attn.o_proj": (h, nH * dv),
    }
    if cfg.q_lora_rank:
        shapes["self_attn.q_a_proj"] = (cfg.q_lora_rank, h)
        shapes["self_attn.q_b_proj"] = (nH * dqk, cfg.q_lora_rank)
    else:
        shapes["self_attn.q_proj"] = (nH * dqk, h)
    return shapes


def _attn_names(cfg: DeepseekConfig) -> tuple[str, ...]:
    return tuple(_attn_shapes(cfg).keys())


def init_params(cfg: DeepseekConfig, key: jax.Array) -> dict:
    h, m = cfg.hidden_size, cfg.moe_intermediate_size
    E = cfg.n_routed_experts
    Ld = cfg.first_k_dense_replace
    Lm = cfg.num_hidden_layers - Ld
    assert 0 <= Ld < cfg.num_hidden_layers

    def winit(k, shape, fan):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan)).astype(
            cfg.dtype
        )

    keys = iter(jax.random.split(key, 64))

    def attn_block(L):
        blk = {
            "input_layernorm": jnp.ones((L, h), cfg.dtype),
            "post_attention_layernorm": jnp.ones((L, h), cfg.dtype),
        }
        for name, shape in _attn_shapes(cfg).items():
            blk[name] = winit(next(keys), (L, *shape), shape[1])
        if cfg.q_lora_rank:
            blk["self_attn.q_a_norm"] = jnp.ones((L, cfg.q_lora_rank), cfg.dtype)
        blk["self_attn.kv_a_norm"] = jnp.ones((L, cfg.kv_lora_rank), cfg.dtype)
        return blk

    layers_dense = None
    if Ld:
        layers_dense = attn_block(Ld)
        f = cfg.intermediate_size
        layers_dense["mlp.gate_proj"] = winit(next(keys), (Ld, f, h), h)
        layers_dense["mlp.up_proj"] = winit(next(keys), (Ld, f, h), h)
        layers_dense["mlp.down_proj"] = winit(next(keys), (Ld, h, f), f)

    layers_moe = attn_block(Lm)
    layers_moe["moe.router"] = winit(next(keys), (Lm, E, h), h)
    layers_moe["moe.e_bias"] = jnp.zeros((Lm, E), jnp.float32)
    layers_moe["moe.gate_proj"] = winit(next(keys), (Lm, E, m, h), h)
    layers_moe["moe.up_proj"] = winit(next(keys), (Lm, E, m, h), h)
    layers_moe["moe.down_proj"] = winit(next(keys), (Lm, E, h, m), m)
    ms = cfg.n_shared_experts * m
    layers_moe["shared.gate_proj"] = winit(next(keys), (Lm, ms, h), h)
    layers_moe["shared.up_proj"] = winit(next(keys), (Lm, ms, h), h)
    layers_moe["shared.down_proj"] = winit(next(keys), (Lm, h, ms), ms)

    params = {
        "embed_tokens": winit(next(keys), (cfg.vocab_size, h), h),
        "norm": jnp.ones((h,), cfg.dtype),
        "lm_head": winit(next(keys), (cfg.vocab_size, h), h),
        "layers_moe": layers_moe,
    }
    if layers_dense is not None:
        params["layers_dense"] = layers_dense
    return params


def param_specs(cfg: DeepseekConfig) -> dict:
    """PartitionSpecs: MLA projections TP-sharded on the head/latent output
    axis, experts sharded over the `expert` mesh axis (EP), shared experts
    TP like dense llama MLPs."""

    def attn_specs():
        sp = {
            "input_layernorm": P(None, None),
            "post_attention_layernorm": P(None, None),
            # output-dim sharding on heads (columns); o_proj row-sharded
            "self_attn.kv_a_proj": P(None, None, None),  # small latent: replicate
            "self_attn.kv_b_proj": P(None, "tensor", None),
            "self_attn.o_proj": P(None, None, "tensor"),
            "self_attn.kv_a_norm": P(None, None),
        }
        if cfg.q_lora_rank:
            sp["self_attn.q_a_proj"] = P(None, None, None)
            sp["self_attn.q_a_norm"] = P(None, None)
            sp["self_attn.q_b_proj"] = P(None, "tensor", None)
        else:
            sp["self_attn.q_proj"] = P(None, "tensor", None)
        return sp

    specs: dict[str, Any] = {
        "embed_tokens": P(None, None),
        "norm": P(None),
        "lm_head": P("tensor", None),
    }
    if cfg.first_k_dense_replace:
        d = attn_specs()
        d["mlp.gate_proj"] = P(None, "tensor", None)
        d["mlp.up_proj"] = P(None, "tensor", None)
        d["mlp.down_proj"] = P(None, None, "tensor")
        specs["layers_dense"] = d
    mo = attn_specs()
    mo["moe.router"] = P(None, None, None)
    mo["moe.e_bias"] = P(None, None)
    mo["moe.gate_proj"] = P(None, "expert", "tensor", None)
    mo["moe.up_proj"] = P(None, "expert", "tensor", None)
    mo["moe.down_proj"] = P(None, "expert", None, "tensor")
    mo["shared.gate_proj"] = P(None, "tensor", None)
    mo["shared.up_proj"] = P(None, "tensor", None)
    mo["shared.down_proj"] = P(None, None, "tensor")
    specs["layers_moe"] = mo
    return specs


def build_layout(cfg: DeepseekConfig, qcfg: QuantizeConfig) -> llama.QuantLayout:
    sites: dict[str, QuantizerConfig] = {}
    for name in _attn_names(cfg) + DENSE_NAMES + MOE_NAMES + SHARED_NAMES:
        full = f"model.layers.0.{name}"
        sites[f"{name}.weight"] = qcfg.resolve(f"{full}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{full}.input_quantizer")
    sites["moe.router.weight"] = qcfg.resolve(
        "model.layers.0.moe.router.weight_quantizer"
    )
    # latent-cache sites ride the k/v bmm wildcard rules so KV presets apply
    sites["self_attn.ckv_bmm"] = qcfg.resolve(
        "model.layers.0.self_attn.k_bmm_quantizer"
    )
    sites["self_attn.kpe_bmm"] = qcfg.resolve(
        "model.layers.0.self_attn.v_bmm_quantizer"
    )
    sites["lm_head.weight"] = qcfg.resolve("lm_head.weight_quantizer")
    sites["embed_tokens.weight"] = qcfg.resolve("embed_tokens.weight_quantizer")
    return llama.QuantLayout(sites=tuple(sites.items()))


def _init_site_states(cfg, layout, names, shapes, L, E=None):
    out: dict[str, Any] = {}
    for name in names:
        wcfg = layout.get(f"{name}.weight")
        icfg = layout.get(f"{name}.input")
        sub = {}
        if wcfg.enable:
            st = Q.init_state(wcfg, shapes[name])
            lead = (L, E) if E is not None else (L,)
            sub["weight"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, lead + a.shape).copy(), st
            )
        if icfg.enable:
            st = Q.init_state(icfg, (1, 1, shapes[name][1]))
            sub["input"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), st
            )
        if sub:
            out[name] = sub
    return out


def init_quant_state(cfg: DeepseekConfig, layout: llama.QuantLayout) -> dict:
    """Two stacked state trees: {"dense": [Ld,...], "moe": [Lm,...]}."""
    Ld = cfg.first_k_dense_replace
    Lm = cfg.num_hidden_layers - Ld
    h, m = cfg.hidden_size, cfg.moe_intermediate_size
    attn_shapes = _attn_shapes(cfg)

    def cache_sites(L):
        out = {}
        for site, dim in (
            ("self_attn.ckv_bmm", cfg.kv_lora_rank),
            ("self_attn.kpe_bmm", cfg.qk_rope_head_dim),
        ):
            ccfg = layout.get(site)
            if ccfg.enable:
                st = Q.init_state(ccfg, (1, 1, dim))
                out[site] = jax.tree.map(
                    lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), st
                )
        return out

    state: dict[str, Any] = {}
    if Ld:
        dshapes = dict(attn_shapes)
        f = cfg.intermediate_size
        dshapes.update({
            "mlp.gate_proj": (f, h), "mlp.up_proj": (f, h), "mlp.down_proj": (h, f),
        })
        state["dense"] = {
            **_init_site_states(cfg, layout, list(attn_shapes) + list(DENSE_NAMES),
                                dshapes, Ld),
            **cache_sites(Ld),
        }
    mshapes = dict(attn_shapes)
    mshapes.update({
        "moe.gate_proj": (m, h), "moe.up_proj": (m, h), "moe.down_proj": (h, m),
    })
    ms = cfg.n_shared_experts * m
    mshapes.update({
        "shared.gate_proj": (ms, h), "shared.up_proj": (ms, h),
        "shared.down_proj": (h, ms),
    })
    moe_state = _init_site_states(cfg, layout, list(attn_shapes) + list(SHARED_NAMES),
                                  mshapes, Lm)
    moe_state.update(
        _init_site_states(cfg, layout, MOE_NAMES, mshapes, Lm, E=cfg.n_routed_experts)
    )
    moe_state.update(cache_sites(Lm))
    state["moe"] = moe_state
    return state


def _mla_attention(cfg, x, lp, lstate, layout, positions, mask, cache, calib):
    """MLA forward. cache: (ckv [B,S,r], kpe [B,S,dr], pos) or None.

    Prefill (no cache) runs the naive expanded form; with a cache the
    absorbed/latent form runs against the compressed cache. Both are exactly
    equal (tested); the absorbed form never materializes per-head K/V for
    cached tokens — the MLA decode-bandwidth win."""
    B, T, h = x.shape
    nH = cfg.num_attention_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    r = cfg.kv_lora_rank
    scale = 1.0 / math.sqrt(dn + dr)
    new_state: dict[str, Any] = {}

    def lin(name, inp):
        y, s = llama._linear(inp, lp[name], name, layout, lstate, calib)
        if s:
            new_state[name] = s
        return y

    # ---- queries -------------------------------------------------------
    if cfg.q_lora_rank:
        cq = lin("self_attn.q_a_proj", x)
        cq = llama.rms_norm(cq, lp["self_attn.q_a_norm"], cfg.rms_norm_eps)
        q = lin("self_attn.q_b_proj", cq)
    else:
        q = lin("self_attn.q_proj", x)
    q = q.reshape(B, T, nH, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = llama.rope(q_pe, positions, cfg.rope_theta, cfg.rope_scaling)

    # ---- compressed KV ---------------------------------------------------
    ckv_full = lin("self_attn.kv_a_proj", x)  # [B, T, r + dr]
    c_kv = llama.rms_norm(
        ckv_full[..., :r], lp["self_attn.kv_a_norm"], cfg.rms_norm_eps
    )
    k_pe = ckv_full[..., None, r:]  # [B, T, 1, dr] (MQA: shared across heads)
    k_pe = llama.rope(k_pe, positions, cfg.rope_theta, cfg.rope_scaling)[:, :, 0]

    # latent-cache quantizers (MLA analog of the k/v bmm sites)
    ccfg = layout.get("self_attn.ckv_bmm")
    pcfg = layout.get("self_attn.kpe_bmm")
    c_kv, cst = llama._qsite(c_kv, ccfg, (lstate or {}).get("self_attn.ckv_bmm"), calib)
    if cst is not None:
        new_state["self_attn.ckv_bmm"] = cst
    k_pe, pst = llama._qsite(k_pe, pcfg, (lstate or {}).get("self_attn.kpe_bmm"), calib)
    if pst is not None:
        new_state["self_attn.kpe_bmm"] = pst

    # kv_b input quantizer statistics are collected on the latent (its
    # actual matmul input in both forms); quantization applies per branch.
    wkv_b = lp["self_attn.kv_b_proj"]
    kvb_cfg = layout.get("self_attn.kv_b_proj.weight")
    kvb_icfg = layout.get("self_attn.kv_b_proj.input")
    sub = dict((lstate or {}).get("self_attn.kv_b_proj", {}))
    if calib:
        if kvb_cfg.enable:
            sub["weight"] = Q.collect(
                wkv_b, kvb_cfg, sub.get("weight") or QuantizerState()
            )
        if kvb_icfg.enable:
            sub["input"] = Q.collect(
                c_kv, kvb_icfg, sub.get("input") or QuantizerState()
            )
    else:
        if kvb_cfg.enable:
            wkv_b = Q.quantize(wkv_b, kvb_cfg, sub.get("weight"))
        if kvb_icfg.enable:
            c_kv = Q.quantize(c_kv, kvb_icfg, sub.get("input"))
    if sub:
        new_state["self_attn.kv_b_proj"] = sub

    new_cache = None
    if cache is not None:
        cckv, ckpe, pos = cache
        cckv = jax.lax.dynamic_update_slice_in_dim(
            cckv, c_kv.astype(cckv.dtype), pos, axis=1
        )
        ckpe = jax.lax.dynamic_update_slice_in_dim(
            ckpe, k_pe.astype(ckpe.dtype), pos, axis=1
        )
        new_cache = (cckv, ckpe)
        # ---- absorbed form against the latent cache ---------------------
        wkb = wkv_b.reshape(nH, dn + dv, r)
        wk, wv = wkb[:, :dn], wkb[:, dn:]  # [nH, dn, r], [nH, dv, r]
        q_lat = jnp.einsum("btnd,ndr->btnr", q_nope.astype(jnp.float32),
                           wk.astype(jnp.float32))
        scores = (
            jnp.einsum("btnr,bsr->bnts", q_lat, cckv.astype(jnp.float32))
            + jnp.einsum("btnd,bsd->bnts", q_pe.astype(jnp.float32),
                         ckpe.astype(jnp.float32))
        ) * scale
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx_lat = jnp.einsum("bnts,bsr->btnr", probs, cckv.astype(jnp.float32))
        ctx = jnp.einsum("btnr,ndr->btnd", ctx_lat, wv.astype(jnp.float32))
        ctx = ctx.astype(x.dtype).reshape(B, T, nH * dv)
    else:
        # ---- naive expanded form (prefill) -------------------------------
        kv = c_kv @ wkv_b.T.astype(c_kv.dtype)  # [B, T, nH*(dn+dv)]
        kv = kv.reshape(B, T, nH, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]
        k_full = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe[:, :, None, :], (B, T, nH, dr))], axis=-1
        )
        q_full = jnp.concatenate([q_nope, q_pe], axis=-1)
        scores = jnp.einsum(
            "btnd,bsnd->bnts", q_full, k_full, preferred_element_type=jnp.float32
        ) * scale
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bnts,bsnd->btnd", probs, v).reshape(B, T, nH * dv)

    out = lin("self_attn.o_proj", ctx)
    return out, new_state, new_cache


def _route(cfg: DeepseekConfig, logits: jax.Array, e_bias: jax.Array):
    """DeepSeek-V3 routing: sigmoid scores + correction bias for selection,
    group-limited top-k, original scores as weights. logits [S, E] fp32."""
    E, k = cfg.n_routed_experts, cfg.num_experts_per_tok
    scores = jax.nn.sigmoid(logits)
    choice = scores + e_bias[None, :]
    if cfg.n_group > 1:
        S = choice.shape[0]
        g = choice.reshape(S, cfg.n_group, E // cfg.n_group)
        # group score = sum of its top-2 members (V3 formulation)
        top2 = jax.lax.top_k(g, min(2, g.shape[-1]))[0].sum(axis=-1)  # [S, G]
        _, gidx = jax.lax.top_k(top2, cfg.topk_group)
        gmask = jnp.zeros_like(top2).at[
            jnp.arange(S)[:, None], gidx
        ].set(1.0)  # [S, G]
        choice = jnp.where(
            jnp.repeat(gmask, E // cfg.n_group, axis=-1) > 0, choice, -jnp.inf
        )
    _, topi = jax.lax.top_k(choice, k)  # [S, k]
    topw = jnp.take_along_axis(scores, topi, axis=-1)
    if cfg.norm_topk_prob and k > 1:
        topw = topw / (jnp.sum(topw, axis=-1, keepdims=True) + 1e-20)
    topw = topw * cfg.routed_scaling_factor
    return topw, topi


def _moe_mlp(cfg: DeepseekConfig, x, lp, lstate, layout, calib):
    """Routed experts + shared experts. x: [B, T, H]."""
    B, T, H = x.shape
    E, k = cfg.n_routed_experts, cfg.num_experts_per_tok
    S = B * T
    C = max(int(cfg.capacity_factor * S * k / E), 1)
    xf = x.reshape(S, H)
    new_state: dict[str, Any] = {}

    logits = xf.astype(jnp.float32) @ lp["moe.router"].T.astype(jnp.float32)
    topw, topi = _route(cfg, logits, lp["moe.e_bias"])

    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [S, k, E]
    pos = jnp.cumsum(onehot.reshape(S * k, E), axis=0).reshape(S, k, E) - 1.0
    in_cap = (pos < C) & (onehot > 0)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)
    assign = onehot[..., None] * in_cap[..., None] * slot  # [S, k, E, C]
    dispatch = jnp.sum(assign, axis=1)  # [S, E, C]
    combine = jnp.einsum("skec,sk->sec", assign, topw.astype(jnp.float32))

    xe = jnp.einsum("sec,sh->ech", dispatch, xf.astype(jnp.float32)).astype(x.dtype)

    def expert_ffn(xe_e, wg, wu, wd, wst, ist):
        def qw(name, w, st):
            wcfg = layout.get(f"{name}.weight")
            if not wcfg.enable or calib:
                return w
            return Q.quantize(w, wcfg, st)

        icfg = layout.get("moe.gate_proj.input")
        h_in = xe_e
        if icfg.enable and not calib and ist is not None:
            h_in = Q.quantize(h_in, icfg, ist)
        g = h_in @ qw("moe.gate_proj", wg, wst["moe.gate_proj"]).T.astype(h_in.dtype)
        u = h_in @ qw("moe.up_proj", wu, wst["moe.up_proj"]).T.astype(h_in.dtype)
        y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
            xe_e.dtype
        )
        return y @ qw("moe.down_proj", wd, wst["moe.down_proj"]).T.astype(y.dtype)

    wst = {
        name: (lstate or {}).get(name, {}).get("weight", QuantizerState())
        for name in MOE_NAMES
    }
    ist = (lstate or {}).get("moe.gate_proj", {}).get("input")
    ye = jax.vmap(expert_ffn, in_axes=(0, 0, 0, 0, 0, None))(
        xe, lp["moe.gate_proj"], lp["moe.up_proj"], lp["moe.down_proj"], wst, ist
    )
    y = jnp.einsum("sec,ech->sh", combine, ye.astype(jnp.float32)).astype(x.dtype)

    # shared experts: always-on dense branch
    shared, st_sh, _ = llama._mlp(
        x, {f"mlp.{p}": lp[f"shared.{p}"] for p in ("gate_proj", "up_proj", "down_proj")},
        {f"mlp.{p}": (lstate or {}).get(f"shared.{p}", {})
         for p in ("gate_proj", "up_proj", "down_proj")} if lstate else None,
        _SharedLayoutView(layout), calib,
    )
    for p in ("gate_proj", "up_proj", "down_proj"):
        if st_sh.get(f"mlp.{p}"):
            new_state[f"shared.{p}"] = st_sh[f"mlp.{p}"]

    if calib:
        for name in MOE_NAMES:
            wcfg = layout.get(f"{name}.weight")
            if wcfg.enable:
                st = (lstate or {}).get(name, {}).get("weight", QuantizerState())
                new_state.setdefault(name, {})["weight"] = jax.vmap(
                    lambda w, s: Q.collect(w, wcfg, s)
                )(lp[name], st)
        icfg = layout.get("moe.gate_proj.input")
        if icfg.enable:
            st = (lstate or {}).get("moe.gate_proj", {}).get("input", QuantizerState())
            new_state.setdefault("moe.gate_proj", {})["input"] = Q.collect(x, icfg, st)

    return (y + shared.reshape(S, H)).reshape(B, T, H), new_state


class _SharedLayoutView:
    """Maps `mlp.*` lookups (llama._mlp's naming) onto `shared.*` sites."""

    def __init__(self, layout):
        self._layout = layout

    def get(self, key: str) -> QuantizerConfig:
        return self._layout.get(key.replace("mlp.", "shared.", 1))


def init_cache(cfg: DeepseekConfig, batch: int, max_len: int, dtype=None) -> dict:
    """Latent KV cache: per layer [B, S, r] + [B, S, dr] — ~8x smaller than
    an expanded [B, S, nH, hd] k/v pair at V3 shapes (the MLA selling point)."""
    dtype = dtype or cfg.dtype
    Ld = cfg.first_k_dense_replace
    Lm = cfg.num_hidden_layers - Ld
    out = {
        "ckv_moe": jnp.zeros((Lm, batch, max_len, cfg.kv_lora_rank), dtype),
        "kpe_moe": jnp.zeros((Lm, batch, max_len, cfg.qk_rope_head_dim), dtype),
        "pos": jnp.asarray(0, jnp.int32),
    }
    if Ld:
        out["ckv_dense"] = jnp.zeros((Ld, batch, max_len, cfg.kv_lora_rank), dtype)
        out["kpe_dense"] = jnp.zeros((Ld, batch, max_len, cfg.qk_rope_head_dim), dtype)
    return out


def forward(
    cfg: DeepseekConfig,
    params: dict,
    tokens: jax.Array,
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
):
    """Returns (logits, new_qstate, new_cache). qstate follows the
    {"dense": ..., "moe": ...} split of `init_quant_state`."""
    if layout is None:
        layout = llama.QuantLayout(sites=())
    B, T = tokens.shape
    if positions is None:
        start = cache["pos"] if cache is not None else 0
        positions = start + jnp.arange(T)[None, :].astype(jnp.int32)
        positions = jnp.broadcast_to(positions, (B, T))

    x = params["embed_tokens"][tokens].astype(cfg.dtype)

    if cache is not None:
        S = cache["ckv_moe"].shape[2]
        kpos = jnp.arange(S)[None, :]
        qpos = positions[0][:, None]
        mask = jnp.where(kpos <= qpos, 0.0, -1e9)[None, None, :, :].astype(jnp.float32)
    else:
        mask = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)

    Ld = cfg.first_k_dense_replace
    new_cache: Optional[dict] = dict(cache) if cache is not None else None

    def run_group(x, group_params, group_state, is_moe, ckv, kpe):
        def body(carry, per_layer):
            x = carry
            lp, lstate, c1, c2 = per_layer
            c = (c1, c2, cache["pos"]) if cache is not None else None
            h = llama.rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            attn, st_a, nc = _mla_attention(
                cfg, h, lp, lstate, layout, positions, mask, c, calib
            )
            x = x + attn
            h = llama.rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            if is_moe:
                y, st_m = _moe_mlp(cfg, h, lp, lstate, layout, calib)
            else:
                y, st_m, _ = llama._mlp(h, lp, lstate, layout, calib)
            x = x + y
            st = {**st_a, **st_m}
            return x, (st, nc[0] if nc else c1, nc[1] if nc else c2)

        xs = (group_params, group_state, ckv, kpe)
        x, (new_state, nckv, nkpe) = jax.lax.scan(body, x, xs)
        return x, new_state, nckv, nkpe

    new_qstate: dict[str, Any] = {}
    if Ld:
        Ldense = params["layers_dense"]["input_layernorm"].shape[0]
        ckv = cache["ckv_dense"] if cache is not None else jnp.zeros((Ldense, 0))
        kpe = cache["kpe_dense"] if cache is not None else jnp.zeros((Ldense, 0))
        x, st, nckv, nkpe = run_group(
            x, params["layers_dense"], (qstate or {}).get("dense"), False, ckv, kpe
        )
        if st:
            new_qstate["dense"] = st
        if cache is not None:
            new_cache["ckv_dense"], new_cache["kpe_dense"] = nckv, nkpe
    Lm = params["layers_moe"]["input_layernorm"].shape[0]
    ckv = cache["ckv_moe"] if cache is not None else jnp.zeros((Lm, 0))
    kpe = cache["kpe_moe"] if cache is not None else jnp.zeros((Lm, 0))
    x, st, nckv, nkpe = run_group(
        x, params["layers_moe"], (qstate or {}).get("moe"), True, ckv, kpe
    )
    if st:
        new_qstate["moe"] = st
    if cache is not None:
        new_cache["ckv_moe"], new_cache["kpe_moe"] = nckv, nkpe
        new_cache["pos"] = cache["pos"] + T

    x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    out_state = new_qstate if (calib or qstate) else None
    return logits, out_state, new_cache


# --------------------------------------------------------------------------
# PTQ entry (the `examples/deepseek/ptq.py` flow, functional form)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class DeepseekQuantizedModel:
    """PTQ handle for the DeepSeek model (QuantizedModel analog)."""

    model_cfg: DeepseekConfig
    params: dict
    layout: llama.QuantLayout
    qstate: dict
    quant_cfg: QuantizeConfig

    def forward(self, tokens, **kw):
        return forward(
            self.model_cfg, self.params, tokens,
            layout=self.layout, qstate=self.qstate, **kw,
        )


def quantize(
    cfg: DeepseekConfig,
    params: dict,
    quant_cfg,
    calib_batches,
) -> DeepseekQuantizedModel:
    """Max-calibration PTQ over the MLA + MoE model.

    The reference quantizes DeepSeek by wrapping its parallel linears with
    TensorQuantizers and running max calibration (`deepseek_v3/ptq.py:129`);
    here the same in-forward collection runs through the quant sites of
    `build_layout` — under an EP/TP mesh the amax reductions come from GSPMD
    (see `examples/deepseek_ptq_sharded.py`)."""
    from ..quant.config import get_preset

    if isinstance(quant_cfg, str):
        quant_cfg = get_preset(quant_cfg)
    layout = build_layout(cfg, quant_cfg)
    qstate = init_quant_state(cfg, layout)
    step = jax.jit(
        lambda p, t, q: forward(cfg, p, t, layout=layout, qstate=q, calib=True)[1]
    )
    for batch in calib_batches:
        qstate = step(params, jnp.asarray(batch), qstate)
    return DeepseekQuantizedModel(cfg, params, layout, qstate, quant_cfg)

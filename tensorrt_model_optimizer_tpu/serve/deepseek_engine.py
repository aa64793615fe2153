"""DeepSeek serving: real-quant decode over the MLA latent cache.

The engine-decode leg of BASELINE config[4] (the reference hands DeepSeek
checkpoints to TRT-LLM/SGLang after PTQ; this framework serves them itself,
like `serve/engine.py` does for llama). Weights pack through the same
`quant.compress.compress_weight` kinds; the decode step runs the ABSORBED
MLA form against the compressed latent cache ([S, r] + [S, dr] per token),
which is the architecture's decode-bandwidth win.

XLA backend: projections dequantize per layer inside the scan (never all
layers at once) and the expert FFNs run the capacity-dispatch einsums on
dequantized expert stacks. A Pallas fused path for the MLA einsums is a
future optimization; the 2-D projections could already route through
`ops.pallas.qmm` — kept on one code path here for clarity until profiled.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..models import deepseek as ds
from ..models import llama
from ..quant import quantizer as Q
from ..ops.pallas import qmm
from ..quant.compress import compress_weight, decompress_weight


@dataclasses.dataclass
class DeepseekCompressedModel:
    model_cfg: ds.DeepseekConfig
    params: dict  # layers_dense/layers_moe leaves replaced by packed dicts
    kinds: dict  # site name -> kind ("nvfp4" | "int4" | "fp8" | "int8" | "bf16")
    layout: llama.QuantLayout
    qstate: dict
    # "auto": fused Pallas dequant-matmuls on TPU, XLA decompress elsewhere
    backend: str = "auto"


def compress(qm: ds.DeepseekQuantizedModel) -> DeepseekCompressedModel:
    """Pack every projection (attention, shared and routed experts)."""
    cfg = qm.model_cfg
    kinds: dict[str, str] = {}
    params = dict(qm.params)

    def pack_group(group_key, state_key, names):
        if group_key not in qm.params:
            return
        new = dict(qm.params[group_key])
        gstate = qm.qstate.get(state_key, {})
        for name in names:
            if name not in new:
                continue
            wcfg = qm.layout.get(f"{name}.weight")
            st = gstate.get(name, {}).get("weight")
            kind, arrays = compress_weight(new[name], wcfg, st)
            kinds[name] = kind
            new[name] = arrays
        params[group_key] = new

    attn = ds._attn_names(cfg)
    pack_group("layers_dense", "dense", attn + ds.DENSE_NAMES)
    pack_group("layers_moe", "moe", attn + ds.MOE_NAMES + ds.SHARED_NAMES)
    return DeepseekCompressedModel(cfg, params, kinds, qm.layout, qm.qstate)


def _deq(cm: DeepseekCompressedModel, name: str, arrays, dtype):
    kind = cm.kinds.get(name, "bf16")
    return decompress_weight(kind, arrays, out_dtype=dtype)


_PALLAS_KINDS = ("int8", "int4", "int4w", "nvfp4", "nvfp4p", "nvfp4w", "fp8")


def _lin(cm, lstate, name, x, lp, dtype, tp_axis=None, row=False, psum_out=True):
    """y = q_act(x) @ dequant(W)^T for a [*, K] input.

    Packed 2-D projections route through the fused Pallas dequant-matmuls
    (`ops.pallas.qmm`) on TPU — same dispatch as `engine._qlinear`; the XLA
    path decompresses per layer inside the scan. Under TP (`tp_axis` set
    inside shard_map), `row=True` marks row-parallel sites whose K dim is
    sharded: dynamic per-token act amaxes pmax-reduce across the axis
    (single-device bit parity) and the partial product psum-reduces
    (`psum_out=False` lets the caller fold several partials into one
    psum)."""
    icfg = cm.layout.get(f"{name}.input")
    ist = (lstate or {}).get(name, {}).get("input")
    if icfg.enable or (ist is not None and ist.pre_quant_scale is not None):
        reduce = (
            (lambda am: jax.lax.pmax(am, tp_axis))
            if (tp_axis is not None and row)
            else None
        )
        x = Q.quantize(x, icfg, ist, amax_reduce=reduce)
    kind = cm.kinds.get(name, "bf16")
    use_pallas = cm.backend == "pallas" or (
        cm.backend == "auto" and qmm.pallas_supported())
    arrs = lp[name]
    main = arrs.get("packed", arrs.get("q")) if isinstance(arrs, dict) else None
    if use_pallas and kind in _PALLAS_KINDS and main is not None and main.ndim == 2:
        lead = x.shape[:-1]
        y = qmm.quantized_matmul(
            x.reshape(-1, x.shape[-1]), kind, arrs
        ).reshape(lead + (-1,))
        y = y.astype(x.dtype)
    else:
        w = _deq(cm, name, lp[name], dtype)
        y = x @ w.T.astype(x.dtype)
    if tp_axis is not None and row and psum_out:
        y = jax.lax.psum(y, tp_axis)
    return y


def _mla_decode(cfg, cm, x, lp, lstate, positions, mask, ckv, kpe, pos, dtype,
                tp_axis=None):
    """Absorbed MLA over the latent cache (serving form of
    `models/deepseek._mla_attention`'s cached branch).

    Under TP the head projections are column-sharded so the local head
    count comes from the projection output (not cfg); the latent cache and
    latent projections are replicated, so attention is fully local and only
    o_proj psums."""
    B, T, _ = x.shape
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    r = cfg.kv_lora_rank
    import math

    scale = 1.0 / math.sqrt(dn + dr)

    if cfg.q_lora_rank:
        cq = _lin(cm, lstate, "self_attn.q_a_proj", x, lp, dtype, tp_axis)
        cq = llama.rms_norm(cq, lp["self_attn.q_a_norm"], cfg.rms_norm_eps)
        q = _lin(cm, lstate, "self_attn.q_b_proj", cq, lp, dtype, tp_axis)
    else:
        q = _lin(cm, lstate, "self_attn.q_proj", x, lp, dtype, tp_axis)
    nH = q.shape[-1] // (dn + dr)  # LOCAL heads under TP
    q = q.reshape(B, T, nH, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = llama.rope(q_pe, positions, cfg.rope_theta, cfg.rope_scaling)

    ckv_full = _lin(cm, lstate, "self_attn.kv_a_proj", x, lp, dtype, tp_axis)
    c_kv = llama.rms_norm(
        ckv_full[..., :r], lp["self_attn.kv_a_norm"], cfg.rms_norm_eps
    )
    k_pe = ckv_full[..., None, r:]
    k_pe = llama.rope(k_pe, positions, cfg.rope_theta, cfg.rope_scaling)[:, :, 0]

    # latent-cache quantizers (cast-style; same sites as the model fwd)
    ccfg = cm.layout.get("self_attn.ckv_bmm")
    pcfg = cm.layout.get("self_attn.kpe_bmm")
    cst = (lstate or {}).get("self_attn.ckv_bmm")
    pst = (lstate or {}).get("self_attn.kpe_bmm")
    if ccfg.enable:
        c_kv = Q.quantize(c_kv, ccfg, cst)
    if pcfg.enable:
        k_pe = Q.quantize(k_pe, pcfg, pst)

    # kv_b input quantization applies BEFORE caching — the model forward
    # stores the quantized latent (models/deepseek._mla_attention), and the
    # engine must match it bit-for-bit for token parity
    wkv_b = _deq(cm, "self_attn.kv_b_proj", lp["self_attn.kv_b_proj"], dtype)
    kvb_icfg = cm.layout.get("self_attn.kv_b_proj.input")
    if kvb_icfg.enable:
        c_kv = Q.quantize(
            c_kv, kvb_icfg, (lstate or {}).get("self_attn.kv_b_proj", {}).get("input")
        )

    ckv = jax.lax.dynamic_update_slice_in_dim(ckv, c_kv.astype(ckv.dtype), pos, axis=1)
    kpe = jax.lax.dynamic_update_slice_in_dim(kpe, k_pe.astype(kpe.dtype), pos, axis=1)
    wkb = wkv_b.reshape(nH, dn + dv, r)
    wk, wv = wkb[:, :dn], wkb[:, dn:]
    q_lat = jnp.einsum("btnd,ndr->btnr", q_nope.astype(jnp.float32),
                       wk.astype(jnp.float32))
    scores = (
        jnp.einsum("btnr,bsr->bnts", q_lat, ckv.astype(jnp.float32))
        + jnp.einsum("btnd,bsd->bnts", q_pe.astype(jnp.float32),
                     kpe.astype(jnp.float32))
    ) * scale + mask
    probs = jax.nn.softmax(scores, axis=-1)
    ctx_lat = jnp.einsum("bnts,bsr->btnr", probs, ckv.astype(jnp.float32))
    ctx = jnp.einsum("btnr,ndr->btnd", ctx_lat, wv.astype(jnp.float32))
    ctx = ctx.astype(x.dtype).reshape(B, T, nH * dv)
    out = _lin(cm, lstate, "self_attn.o_proj", ctx, lp, dtype, tp_axis, row=True)
    return out, ckv, kpe


def _moe_ffn(cfg, cm, x, lp, lstate, dtype, tp_axis=None):
    """Routed + shared experts on dequantized expert stacks (T small).

    Under TP: routing runs replicated over the FULL expert set (router and
    capacity positions are global so token->slot assignment matches the
    single-device engine exactly); each shard then applies its local E/d
    expert block (EP) and the routed partial rides ONE psum together with
    the shared-expert row-parallel down partial."""
    B, T, H = x.shape
    E, k = cfg.n_routed_experts, cfg.num_experts_per_tok
    S = B * T
    C = max(int(cfg.capacity_factor * S * k / E), 1)
    xf = x.reshape(S, H)
    logits = xf.astype(jnp.float32) @ lp["moe.router"].T.astype(jnp.float32)
    topw, topi = ds._route(cfg, logits, lp["moe.e_bias"])
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)
    pos = jnp.cumsum(onehot.reshape(S * k, E), axis=0).reshape(S, k, E) - 1.0
    in_cap = (pos < C) & (onehot > 0)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)
    assign = onehot[..., None] * in_cap[..., None] * slot
    dispatch = jnp.sum(assign, axis=1)
    combine = jnp.einsum("skec,sk->sec", assign, topw.astype(jnp.float32))

    wg = _deq(cm, "moe.gate_proj", lp["moe.gate_proj"], dtype)  # [E_local, m, H]
    wu = _deq(cm, "moe.up_proj", lp["moe.up_proj"], dtype)
    wd = _deq(cm, "moe.down_proj", lp["moe.down_proj"], dtype)
    if tp_axis is not None:
        e_off = jax.lax.axis_index(tp_axis) * wg.shape[0]
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, e_off, wg.shape[0], axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, e_off, wg.shape[0], axis=1)
    xe = jnp.einsum("sec,sh->ech", dispatch, xf.astype(jnp.float32)).astype(x.dtype)
    icfg = cm.layout.get("moe.gate_proj.input")
    ist = (lstate or {}).get("moe.gate_proj", {}).get("input")

    # vmap over experts with per-expert 2-D matmuls — the SAME op structure
    # as models/deepseek._moe_mlp's expert_ffn, so engine decode stays
    # token-identical to the fake-quant forward (einsum-batched contraction
    # orders round differently and flip near-tie argmaxes)
    def expert_ffn(xe_e, wg_e, wu_e, wd_e):
        h_in = Q.quantize(xe_e, icfg, ist) if icfg.enable else xe_e
        g = h_in @ wg_e.T.astype(h_in.dtype)
        u = h_in @ wu_e.T.astype(h_in.dtype)
        y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
            xe_e.dtype
        )
        return y @ wd_e.T.astype(y.dtype)

    d = jax.vmap(expert_ffn)(xe, wg, wu, wd)
    routed = jnp.einsum("sec,ech->sh", combine, d.astype(jnp.float32)).astype(x.dtype)

    h2 = x.reshape(S, H)
    sg = _lin(cm, lstate, "shared.gate_proj", h2, lp, dtype, tp_axis)
    su = _lin(cm, lstate, "shared.up_proj", h2, lp, dtype, tp_axis)
    sy = (jax.nn.silu(sg.astype(jnp.float32)) * su.astype(jnp.float32)).astype(x.dtype)
    sd = _lin(cm, lstate, "shared.down_proj", sy, lp, dtype, tp_axis,
              row=True, psum_out=False)
    out = routed + sd
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out.reshape(B, T, H)


def _dense_ffn(cm, x, lp, lstate, dtype, tp_axis=None):
    B, T, H = x.shape
    h2 = x.reshape(B * T, H)
    g = _lin(cm, lstate, "mlp.gate_proj", h2, lp, dtype, tp_axis)
    u = _lin(cm, lstate, "mlp.up_proj", h2, lp, dtype, tp_axis)
    y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    return _lin(cm, lstate, "mlp.down_proj", y, lp, dtype, tp_axis,
                row=True).reshape(B, T, H)


def _model_step(cfg, cm, params, qstate, tokens, cache, positions, tp_axis=None):
    B, T = tokens.shape
    dtype = cfg.dtype
    x = params["embed_tokens"][tokens].astype(dtype)
    S = cache["ckv_moe"].shape[2]
    kpos = jnp.arange(S)[None, :]
    qpos = positions[0][:, None]
    mask = jnp.where(kpos <= qpos, 0.0, -1e9)[None, None, :, :].astype(jnp.float32)
    new_cache = dict(cache)

    def run_group(x, gp, gs, is_moe, ckv, kpe):
        def body(carry, per_layer):
            x = carry
            lp, lstate, c1, c2 = per_layer
            h = llama.rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            attn, c1, c2 = _mla_decode(
                cfg, cm, h, lp, lstate, positions, mask, c1, c2, cache["pos"],
                dtype, tp_axis,
            )
            x = x + attn
            h = llama.rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            y = (_moe_ffn(cfg, cm, h, lp, lstate, dtype, tp_axis) if is_moe
                 else _dense_ffn(cm, h, lp, lstate, dtype, tp_axis))
            return x + y, (c1, c2)

        x, (nckv, nkpe) = jax.lax.scan(body, x, (gp, gs, ckv, kpe))
        return x, nckv, nkpe

    if "layers_dense" in params:
        x, nckv, nkpe = run_group(
            x, params["layers_dense"], qstate.get("dense"), False,
            cache["ckv_dense"], cache["kpe_dense"],
        )
        new_cache["ckv_dense"], new_cache["kpe_dense"] = nckv, nkpe
    x, nckv, nkpe = run_group(
        x, params["layers_moe"], qstate.get("moe"), True,
        cache["ckv_moe"], cache["kpe_moe"],
    )
    new_cache["ckv_moe"], new_cache["kpe_moe"] = nckv, nkpe
    new_cache["pos"] = cache["pos"] + T

    x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x[:, -1, :] @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    return logits, new_cache


class DeepseekEngine:
    """Greedy serving over the latent cache (dense + fused decode step).

    Passing `mesh` (a jax.sharding.Mesh with a `tp_axis` axis) shards the
    model TP/EP-style (serve/deepseek_tp.py) and runs every step under
    shard_map — token-identical to the single-device engine."""

    def __init__(self, cm: DeepseekCompressedModel, max_seq_len: int = 2048,
                 mesh=None, tp_axis: str = "tp"):
        self.cm = cm
        self.max_seq_len = max_seq_len
        self.mesh, self.tp_axis = mesh, tp_axis
        self._prefill_fn = None
        self._step_fn = None
        if mesh is not None:
            from . import deepseek_tp as dtp
            from . import tp as tp_mod

            d = int(mesh.shape[tp_axis])
            cm2, specs = dtp.shard_deepseek(cm, d, tp_axis)
            self.cm = dtp.device_put_sharded(cm2, mesh, specs)
            self._pspec = tp_mod._concretize(specs.params, self.cm.params)
            self._qspec = tp_mod._concretize(specs.qstate, self.cm.qstate)

    def _wrap(self, fn, cache, donate=()):
        """jit, or shard_map+jit under TP (cache/tokens replicate)."""
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=donate)
        from . import tp as tp_mod
        from jax.sharding import PartitionSpec as P

        cspec = jax.tree.map(lambda _: P(), cache)
        return jax.jit(
            tp_mod.shard_map_fn(
                fn, self.mesh,
                in_specs=(self._pspec, self._qspec, P(), cspec, P()),
                out_specs=(P(), cspec),
            ),
            donate_argnums=donate,
        )

    def init_cache(self, batch: int, max_len: Optional[int] = None):
        return ds.init_cache(
            self.cm.model_cfg, batch, max_len or self.max_seq_len
        )

    def prefill(self, tokens: jax.Array, cache: dict):
        B, T = tokens.shape
        positions = jnp.broadcast_to(
            jnp.arange(T)[None, :], (B, T)
        ).astype(jnp.int32)
        if self._prefill_fn is None:
            step = partial(_model_step, self.cm.model_cfg, self.cm,
                           tp_axis=self.tp_axis if self.mesh is not None else None)

            def pf(params, qstate, tokens, cache, positions):
                return step(params, qstate, tokens, cache, positions)

            self._prefill_fn = self._wrap(pf, cache)
        return self._prefill_fn(
            self.cm.params, self.cm.qstate, tokens, cache, positions
        )

    def decode_step(self, tok: jax.Array, cache: dict):
        """Fused single-dispatch step (donated cache, on-device argmax)."""
        if self._step_fn is None:
            cfg, cm = self.cm.model_cfg, self.cm
            tpx = self.tp_axis if self.mesh is not None else None

            def one(params, qstate, tok, cache):
                B = tok.shape[0]
                positions = jnp.broadcast_to(
                    cache["pos"][None, None], (B, 1)
                ).astype(jnp.int32)
                logits, cache = _model_step(
                    cfg, cm, params, qstate, tok, cache, positions, tpx
                )
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

            if self.mesh is None:
                self._step_fn = jax.jit(one, donate_argnums=(3,))
            else:
                from . import tp as tp_mod
                from jax.sharding import PartitionSpec as P

                cspec = jax.tree.map(lambda _: P(), cache)
                self._step_fn = jax.jit(
                    tp_mod.shard_map_fn(
                        one, self.mesh,
                        in_specs=(self._pspec, self._qspec, P(), cspec),
                        out_specs=(P(), cspec),
                    ),
                    donate_argnums=(3,),
                )
        return self._step_fn(self.cm.params, self.cm.qstate, tok, cache)

    def generate(self, prompt: jax.Array, max_new_tokens: int = 32):
        cache = self.init_cache(prompt.shape[0])
        logits, cache = self.prefill(prompt, cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        out = [tok]
        for _ in range(max_new_tokens - 1):
            tok, cache = self.decode_step(tok, cache)
            out.append(tok)
        return jnp.concatenate(out, axis=1)

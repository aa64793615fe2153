"""Vision-language model family (LLaVA-style) with PTQ support.

Reference counterpart: `/root/reference/examples/vlm_ptq/` (VLM PTQ
recipes) and the VLM calibration loaders in
`modelopt/torch/utils/dataset_utils.py` — the reference quantizes the
language tower of a vision-language model (vision encoder optionally
included) and exports a deployable checkpoint. TPU-native composition:

  pixels [B, H, W, 3] -> ViT patch encoder -> projector (2-layer MLP,
  LLaVA-style) -> image tokens [B, P, H_lm] prepended to the text token
  embeddings -> the SAME quantized llama stack (`llama.forward` with
  `input_embeds`) -> logits over text positions.

Quantization: the LM tower uses the preset exactly as `llama.build_layout`
does; the vision tower + projector resolve the same preset rules under
their own site names (`vision.*`, `proj.*`) so AutoQuantize/exclusion
wildcards apply uniformly. Calibration runs one fused forward over
(pixels, tokens) batches — amax for vision, projector and LM sites
collect in a single pass (the reference's single forward_loop contract,
`model_calib.py:311`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..quant import quantizer as Q
from ..quant.config import QuantizeConfig
from . import llama

VISION_PROJ = ("attn.qkv", "attn.proj", "mlp.fc1", "mlp.fc2")


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 64
    patch_size: int = 8
    hidden_size: int = 128
    depth: int = 2
    num_heads: int = 4
    dtype: Any = jnp.float32

    @property
    def n_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size ** 2


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    vision: ViTConfig
    lm: llama.LlamaConfig

    @staticmethod
    def tiny(**kw) -> "VLMConfig":
        return VLMConfig(vision=ViTConfig(), lm=llama.LlamaConfig.tiny(), **kw)


def _vit_shapes(v: ViTConfig) -> dict:
    h = v.hidden_size
    return {
        "attn.qkv": (3 * h, h),
        "attn.proj": (h, h),
        "mlp.fc1": (4 * h, h),
        "mlp.fc2": (h, 4 * h),
    }


def init_params(cfg: VLMConfig, key: jax.Array) -> dict:
    v, lm = cfg.vision, cfg.lm
    keys = jax.random.split(key, 8)
    h = v.hidden_size

    def winit(k, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(shape[-1])).astype(v.dtype)

    blocks = {}
    for i, name in enumerate(VISION_PROJ):
        o, kdim = _vit_shapes(v)[name]
        blocks[name] = jnp.stack([
            winit(jax.random.fold_in(keys[0], i * 97 + l), (o, kdim))
            for l in range(v.depth)])
        blocks[name + "__bias"] = jnp.zeros((v.depth, o), v.dtype)
    return {
        "vision": {
            "patch_embed": winit(keys[1], (h, v.patch_dim)),
            "pos_embed": winit(keys[2], (v.n_patches, h)) * 0.02,
            "blocks": blocks,
            "ln_f": jnp.ones((h,), v.dtype),
        },
        "proj": {
            "fc1": winit(keys[3], (lm.hidden_size, h)),
            "fc2": winit(keys[4], (lm.hidden_size, lm.hidden_size)),
        },
        "lm": llama.init_params(lm, keys[5]),
    }


def build_layout(cfg: VLMConfig, qcfg: QuantizeConfig) -> llama.QuantLayout:
    """LM sites resolve exactly like `llama.build_layout`; vision/projector
    sites resolve the same preset rules under `vision.*` / `proj.*` names
    (so `*lm_head*`-style exclusions and format rules apply uniformly)."""
    lm_layout = llama.build_layout(cfg.lm, qcfg)
    sites = dict(lm_layout.sites)
    for name in VISION_PROJ:
        full = f"vision.blocks.0.{name}"
        sites[f"vision.{name}.weight"] = qcfg.resolve(f"{full}.weight_quantizer")
        sites[f"vision.{name}.input"] = qcfg.resolve(f"{full}.input_quantizer")
    for name in ("fc1", "fc2"):
        sites[f"proj.{name}.weight"] = qcfg.resolve(f"proj.{name}.weight_quantizer")
        sites[f"proj.{name}.input"] = qcfg.resolve(f"proj.{name}.input_quantizer")
    return llama.QuantLayout(sites=tuple(sites.items()))


def init_quant_state(cfg: VLMConfig, layout: llama.QuantLayout) -> dict:
    state = llama.init_quant_state(cfg.lm, layout)
    v = cfg.vision
    for name in VISION_PROJ:
        wcfg = layout.get(f"vision.{name}.weight")
        icfg = layout.get(f"vision.{name}.input")
        sub = {}
        if wcfg.enable:
            st = Q.init_state(wcfg, _vit_shapes(v)[name])
            sub["weight"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (v.depth,) + a.shape).copy(), st)
        if icfg.enable:
            st = Q.init_state(icfg, (1, _vit_shapes(v)[name][1]))
            sub["input"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (v.depth,) + a.shape).copy(), st)
        if sub:
            state[f"vision.{name}"] = sub
    for name, shape in (("fc1", (cfg.lm.hidden_size, v.hidden_size)),
                        ("fc2", (cfg.lm.hidden_size, cfg.lm.hidden_size))):
        wcfg = layout.get(f"proj.{name}.weight")
        icfg = layout.get(f"proj.{name}.input")
        sub = {}
        if wcfg.enable:
            sub["weight"] = Q.init_state(wcfg, shape)
        if icfg.enable:
            sub["input"] = Q.init_state(icfg, (1, shape[1]))
        if sub:
            state[f"proj.{name}"] = sub
    return state


def _qlin(x, w, b, site, layout, lstate, calib):
    """Quantized linear (matches dit._qlin semantics)."""
    wcfg = layout.get(f"{site}.weight")
    icfg = layout.get(f"{site}.input")
    sub = dict(lstate) if lstate else {}
    if icfg.enable or sub.get("input") is not None:
        st = sub.get("input")
        if calib:
            st = Q.collect(x, icfg, st if st is not None else Q.QuantizerState())
            sub["input"] = st
        else:
            x = Q.quantize(x, icfg, st)
    w_eff = w
    if wcfg.enable:
        st = sub.get("weight")
        if calib:
            st = Q.collect(w, wcfg, st if st is not None else Q.QuantizerState())
            sub["weight"] = st
        else:
            w_eff = Q.quantize(w, wcfg, st)
    y = x @ w_eff.T.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y, (sub if sub else None)


def encode_image(cfg: VLMConfig, params: dict, pixels: jax.Array, *,
                 layout=None, qstate=None, calib=False):
    """ViT patch encoder + LLaVA projector -> image tokens [B, P, H_lm].

    Returns (img_embeds, new_qstate_entries)."""
    v = cfg.vision
    lay = layout or llama.QuantLayout(sites=())
    vp = params["vision"]
    B = pixels.shape[0]
    p = v.patch_size
    g = v.img_size // p
    x = pixels.astype(v.dtype).reshape(B, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, v.patch_dim)
    s = x @ vp["patch_embed"].T.astype(v.dtype) + vp["pos_embed"][None]
    nH = v.num_heads
    hd = v.hidden_size // nH
    new_states = {}

    def ln(z):
        mu = jnp.mean(z.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(z.astype(jnp.float32), axis=-1, keepdims=True)
        return ((z - mu) * jax.lax.rsqrt(var + 1e-6)).astype(z.dtype)

    def block(carry, per_block):
        s = carry
        bp, lstate = per_block
        ns = {}
        z = ln(s)
        qkv, st = _qlin(z, bp["attn.qkv"], bp["attn.qkv__bias"],
                        "vision.attn.qkv", lay, (lstate or {}).get("attn.qkv"),
                        calib)
        if st:
            ns["attn.qkv"] = st
        N = z.shape[1]
        qkv = qkv.reshape(B, N, 3, nH, hd)
        q, k, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bqnd,bknd->bnqk", q, k,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att / math.sqrt(hd), axis=-1).astype(s.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", att, vv).reshape(B, N, v.hidden_size)
        proj, st = _qlin(ctx, bp["attn.proj"], bp["attn.proj__bias"],
                         "vision.attn.proj", lay,
                         (lstate or {}).get("attn.proj"), calib)
        if st:
            ns["attn.proj"] = st
        s = s + proj
        z = ln(s)
        f1, st = _qlin(z, bp["mlp.fc1"], bp["mlp.fc1__bias"],
                       "vision.mlp.fc1", lay, (lstate or {}).get("mlp.fc1"),
                       calib)
        if st:
            ns["mlp.fc1"] = st
        f1 = jax.nn.gelu(f1.astype(jnp.float32)).astype(s.dtype)
        f2, st = _qlin(f1, bp["mlp.fc2"], bp["mlp.fc2__bias"],
                       "vision.mlp.fc2", lay, (lstate or {}).get("mlp.fc2"),
                       calib)
        if st:
            ns["mlp.fc2"] = st
        s = s + f2
        return s, ns

    vstate = {
        name.split("vision.", 1)[1]: sub
        for name, sub in (qstate or {}).items() if name.startswith("vision.")
    } or None
    s, scanned = jax.lax.scan(block, s, (vp["blocks"], vstate))
    s = llama.rms_norm(s, vp["ln_f"], 1e-6)
    if scanned:
        for name, sub in scanned.items():
            new_states[f"vision.{name}"] = sub
    # LLaVA-style 2-layer MLP projector into the LM embedding space
    pr = params["proj"]
    y, st = _qlin(s, pr["fc1"], None, "proj.fc1", lay,
                  (qstate or {}).get("proj.fc1"), calib)
    if st:
        new_states["proj.fc1"] = st
    y = jax.nn.gelu(y.astype(jnp.float32)).astype(s.dtype)
    y, st = _qlin(y, pr["fc2"], None, "proj.fc2", lay,
                  (qstate or {}).get("proj.fc2"), calib)
    if st:
        new_states["proj.fc2"] = st
    return y.astype(cfg.lm.dtype), new_states


def forward(
    cfg: VLMConfig,
    params: dict,
    pixels: jax.Array,  # [B, H, W, 3]
    tokens: jax.Array,  # [B, T] text tokens
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
):
    """Fused VLM forward: image tokens prepended to text embeddings, one
    causal pass over the LM. Returns (text_logits [B, T, V], new_qstate)
    — logits are sliced to TEXT positions (loss/eval never scores image
    slots)."""
    img, new_vision = encode_image(
        cfg, params, pixels, layout=layout, qstate=qstate, calib=calib)
    emb = params["lm"]["embed_tokens"][tokens].astype(cfg.lm.dtype)
    x = jnp.concatenate([img, emb], axis=1)
    P = img.shape[1]
    logits, lm_state, _ = llama.forward(
        cfg.lm, params["lm"], tokens=None, input_embeds=x,
        layout=layout, qstate=_lm_only(qstate), calib=calib)
    new_state = dict(lm_state or {})
    new_state.update(new_vision or {})
    return logits[:, P:], (new_state if new_state else None)


def _lm_only(qstate):
    if not qstate:
        return qstate
    return {k: v for k, v in qstate.items()
            if not (k.startswith("vision.") or k.startswith("proj."))} or None


def quantize_vlm(cfg: VLMConfig, params: dict, quant_cfg, calib_batches):
    """PTQ: max calibration over (pixels, tokens) batches — one fused
    forward collects vision + projector + LM amax (reference VLM PTQ flow,
    `examples/vlm_ptq/`)."""
    from ..quant.config import get_preset

    qcfg = get_preset(quant_cfg) if isinstance(quant_cfg, str) else quant_cfg
    layout = build_layout(cfg, qcfg)
    qstate = init_quant_state(cfg, layout)
    step = jax.jit(
        lambda p, px, tk, q: forward(
            cfg, p, px, tk, layout=layout, qstate=q, calib=True)[1])
    for px, tk in calib_batches:
        new = step(params, px, tk, qstate)
        merged = dict(qstate)
        merged.update(new)
        qstate = merged
    return layout, qstate

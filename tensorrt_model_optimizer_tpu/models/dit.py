"""Diffusion transformer (DiT) with quantization sites.

The diffusers coverage of the reference (SDXL/PixArt INT8/FP8 PTQ,
`quantization/plugins/diffusion/`, BASELINE SDXL rows) mapped to a TPU-native
architecture: a DiT backbone (patchify + adaLN-zero transformer blocks +
unpatchify), quantization sites named like the reference's diffusers plugin
(`blocks.{i}.attn.qkv` / `attn.proj` / `mlp.fc1` / `mlp.fc2`) so wildcard
presets apply. Blocks are stacked and scanned like the LLM models; quantizer
state rides the scan.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..quant import QuantizeConfig, QuantizerConfig, QuantizerState
from ..quant import quantizer as Q
from . import llama


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    img_size: int = 32
    patch_size: int = 4
    in_channels: int = 4
    hidden_size: int = 256
    depth: int = 6
    num_heads: int = 4
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @property
    def n_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size**2

    @staticmethod
    def tiny(**kw) -> "DiTConfig":
        base = dict(img_size=16, patch_size=4, in_channels=4, hidden_size=64,
                    depth=2, num_heads=4)
        base.update(kw)
        return DiTConfig(**base)


PROJ_NAMES = ("attn.qkv", "attn.proj", "mlp.fc1", "mlp.fc2", "adaLN.mod")


def _shapes(cfg: DiTConfig) -> dict[str, tuple[int, int]]:
    h = cfg.hidden_size
    m = int(h * cfg.mlp_ratio)
    return {
        "attn.qkv": (3 * h, h),
        "attn.proj": (h, h),
        "mlp.fc1": (m, h),
        "mlp.fc2": (h, m),
        "adaLN.mod": (6 * h, h),
    }


def init_params(cfg: DiTConfig, key: jax.Array) -> dict:
    keys = jax.random.split(key, 8)
    h = cfg.hidden_size
    shapes = _shapes(cfg)

    def winit(k, shape, fan):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan)).astype(cfg.dtype)

    blocks: dict[str, Any] = {}
    for i, name in enumerate(PROJ_NAMES):
        o, inp = shapes[name]
        w = winit(jax.random.fold_in(keys[0], i), (cfg.depth, o, inp), inp)
        if name == "adaLN.mod":
            w = w * 0.0  # adaLN-zero init
        blocks[name] = w
        blocks[name + "__bias"] = jnp.zeros((cfg.depth, o), cfg.dtype)
    return {
        "patch_embed": winit(keys[1], (h, cfg.patch_dim), cfg.patch_dim),
        "pos_embed": winit(keys[2], (cfg.n_patches, h), h) * 0.02,
        "t_mlp1": winit(keys[3], (h, 256), 256),
        "t_mlp2": winit(keys[4], (h, h), h),
        "blocks": blocks,
        "final_mod": jnp.zeros((2 * h, h), cfg.dtype),
        "final_proj": jnp.zeros((cfg.patch_dim, h), cfg.dtype),
    }


def build_layout(cfg: DiTConfig, qcfg: QuantizeConfig) -> llama.QuantLayout:
    sites = {}
    for name in PROJ_NAMES:
        full = f"blocks.0.{name}"
        sites[f"{name}.weight"] = qcfg.resolve(f"{full}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{full}.input_quantizer")
    # modulation layers excluded by default (like norms/routers)
    sites["adaLN.mod.weight"] = Q.DISABLED
    sites["adaLN.mod.input"] = Q.DISABLED
    return llama.QuantLayout(sites=tuple(sites.items()))


def init_quant_state(cfg: DiTConfig, layout: llama.QuantLayout) -> dict:
    shapes = _shapes(cfg)
    state: dict = {}
    for name in PROJ_NAMES:
        wcfg = layout.get(f"{name}.weight")
        icfg = layout.get(f"{name}.input")
        sub = {}
        if wcfg.enable:
            st = Q.init_state(wcfg, shapes[name])
            sub["weight"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (cfg.depth,) + a.shape).copy(), st
            )
        if icfg.enable:
            st = Q.init_state(icfg, (1, 1, shapes[name][1]))
            sub["input"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (cfg.depth,) + a.shape).copy(), st
            )
        if sub:
            state[name] = sub
    return state


def timestep_embedding(t: jax.Array, dim: int = 256) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def patchify(x: jax.Array, p: int) -> jax.Array:
    """[B, H, W, C] -> [B, n_patches, p*p*C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def unpatchify(x: jax.Array, img: int, p: int, c: int) -> jax.Array:
    B, N, _ = x.shape
    g = img // p
    x = x.reshape(B, g, g, p, p, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, img, img, c)


def _qlin(x, w, b, name, layout, lstate, calib):
    """Quantized linear with bias for DiT blocks (flattened tokens)."""
    wcfg = layout.get(f"{name}.weight")
    icfg = layout.get(f"{name}.input")
    sub = dict(lstate.get(name, {})) if lstate else {}
    if icfg.enable or (sub.get("input") is not None):
        st = sub.get("input")
        if calib:
            st = Q.collect(x, icfg, st if st is not None else QuantizerState())
            sub["input"] = st
        else:
            x = Q.quantize(x, icfg, st)
    w_eff = w
    if wcfg.enable:
        st = sub.get("weight")
        if calib:
            st = Q.collect(w, wcfg, st if st is not None else QuantizerState())
            sub["weight"] = st
        else:
            w_eff = Q.quantize(w, wcfg, st)
    y = x @ w_eff.T.astype(x.dtype) + b.astype(x.dtype)
    return y, (sub if sub else None)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def forward(
    cfg: DiTConfig,
    params: dict,
    x: jax.Array,  # [B, H, W, C] noisy latents
    t: jax.Array,  # [B] timesteps
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
    return_features: bool = False,
):
    """Noise prediction. Returns (eps_pred [B, H, W, C], new_qstate), or with
    `return_features` (eps, state, feats [B, N, h]) — the post-blocks token
    hidden states (the DMD discriminator'scapture point, replacing the
    reference's forward hooks on teacher blocks)."""
    lay = layout or llama.QuantLayout(sites=())
    B = x.shape[0]
    h = cfg.hidden_size
    nH = cfg.num_heads
    hd = h // nH

    tokens = patchify(x.astype(cfg.dtype), cfg.patch_size)
    s = tokens @ params["patch_embed"].T.astype(cfg.dtype) + params["pos_embed"][None]
    temb = timestep_embedding(t)
    c = jax.nn.silu(temb @ params["t_mlp1"].T.astype(jnp.float32))
    c = (c @ params["t_mlp2"].T.astype(jnp.float32)).astype(cfg.dtype)  # [B, h]

    def ln(z):
        mu = jnp.mean(z.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(z.astype(jnp.float32), axis=-1, keepdims=True)
        return ((z - mu) * jax.lax.rsqrt(var + 1e-6)).astype(z.dtype)

    def block(carry, per_block):
        s = carry
        bp, lstate = per_block
        new_state = {}
        mod = jax.nn.silu(c.astype(jnp.float32)).astype(cfg.dtype)
        mod = mod @ bp["adaLN.mod"].T.astype(cfg.dtype) + bp["adaLN.mod__bias"]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        z = _modulate(ln(s), sh1, sc1)
        qkv, st = _qlin(z, bp["attn.qkv"], bp["attn.qkv__bias"], "attn.qkv", lay, lstate, calib)
        if st: new_state["attn.qkv"] = st
        N = z.shape[1]
        qkv = qkv.reshape(B, N, 3, nH, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att / math.sqrt(hd), axis=-1).astype(s.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", att, v).reshape(B, N, h)
        proj, st = _qlin(ctx, bp["attn.proj"], bp["attn.proj__bias"], "attn.proj", lay, lstate, calib)
        if st: new_state["attn.proj"] = st
        s = s + g1[:, None, :] * proj

        z = _modulate(ln(s), sh2, sc2)
        f1, st = _qlin(z, bp["mlp.fc1"], bp["mlp.fc1__bias"], "mlp.fc1", lay, lstate, calib)
        if st: new_state["mlp.fc1"] = st
        f1 = jax.nn.gelu(f1.astype(jnp.float32)).astype(s.dtype)
        f2, st = _qlin(f1, bp["mlp.fc2"], bp["mlp.fc2__bias"], "mlp.fc2", lay, lstate, calib)
        if st: new_state["mlp.fc2"] = st
        s = s + g2[:, None, :] * f2
        return s, new_state

    s, new_states = jax.lax.scan(block, s, (params["blocks"], qstate))
    fin = jax.nn.silu(c.astype(jnp.float32)).astype(cfg.dtype) @ params["final_mod"].T.astype(cfg.dtype)
    fsh, fsc = jnp.split(fin, 2, axis=-1)
    s = _modulate(ln(s), fsh, fsc)
    out = s @ params["final_proj"].T.astype(cfg.dtype)
    eps = unpatchify(out, cfg.img_size, cfg.patch_size, cfg.in_channels)
    st = dict(new_states) if (calib or qstate) else None
    if return_features:
        return eps, st, s
    return eps, st


def compress_dit(cfg: DiTConfig, params: dict, layout, qstate):
    """Pack calibrated DiT block weights for REAL-quant serving.

    Returns (kinds {site: kind}, packed {site: arrays}) with each block
    site packed per its calibrated quantizer config (stacked [depth, ...]
    arrays, `quant.compress.compress_weight`). The reference's diffusion
    deployment quantizes the DiT/UNet GEMMs to INT8/FP8 TensorRT engines
    (`examples/benchmark.md:47-51`); here the same sites dispatch to the
    Pallas/XLA real-quant matmuls via `forward_packed`."""
    from ..quant.compress import compress_weight

    kinds, packed = {}, {}
    for name in PROJ_NAMES:
        wcfg = layout.get(f"{name}.weight")
        wst = (qstate or {}).get(name, {}).get("weight")
        kind, arrays = compress_weight(params["blocks"][name], wcfg, wst)
        kinds[name] = kind
        packed[name] = arrays
    return kinds, packed


def forward_packed(
    cfg: DiTConfig,
    params: dict,
    kinds: dict,
    packed: dict,
    x: jax.Array,
    t: jax.Array,
    *,
    layout,
    qstate: Optional[dict] = None,
    backend: str = "pallas",
):
    """Real-quant denoise step: `forward`'s math with every block GEMM
    dispatched through the serving engine's quantized matmul (`serve.engine
    ._qlinear` — int8 W8A8 on the s8 MXU, fp8, packed 4-bit, or dequant
    fallback). Returns eps [B, H, W, C]."""
    from ..serve import engine as serve_engine

    class _CMShim:
        def __init__(self, lay):
            self.layout = lay

    cm = _CMShim(layout)
    B = x.shape[0]
    h, nH = cfg.hidden_size, cfg.num_heads
    hd = h // nH
    tokens = patchify(x.astype(cfg.dtype), cfg.patch_size)
    s = tokens @ params["patch_embed"].T.astype(cfg.dtype) + params["pos_embed"][None]
    temb = timestep_embedding(t)
    c = jax.nn.silu(temb @ params["t_mlp1"].T.astype(jnp.float32))
    c = (c @ params["t_mlp2"].T.astype(jnp.float32)).astype(cfg.dtype)

    def ln(z):
        mu = jnp.mean(z.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(z.astype(jnp.float32), axis=-1, keepdims=True)
        return ((z - mu) * jax.lax.rsqrt(var + 1e-6)).astype(z.dtype)

    act_state = {
        name: {"input": sub["input"]}
        for name, sub in (qstate or {}).items()
        if isinstance(sub, dict) and "input" in sub
    }

    def qlin(z, name, pk, lstate, bias):
        B_, N_, K_ = z.shape
        ist = (lstate or {}).get(name, {}).get("input")
        y = serve_engine._qlinear(
            z.reshape(B_ * N_, K_), name, kinds[name], pk[name], cm, backend,
            ist)
        return y.reshape(B_, N_, -1) + bias.astype(y.dtype)

    def block(carry, per_block):
        s = carry
        bp, pk, lstate = per_block
        mod = jax.nn.silu(c.astype(jnp.float32)).astype(cfg.dtype)
        mod = jnp.squeeze(
            qlin(mod[:, None, :], "adaLN.mod", pk, lstate,
                 bp["adaLN.mod__bias"]), 1)
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)
        z = _modulate(ln(s), sh1, sc1)
        qkv = qlin(z, "attn.qkv", pk, lstate, bp["attn.qkv__bias"])
        N = z.shape[1]
        qkv = qkv.reshape(B, N, 3, nH, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att / math.sqrt(hd), axis=-1).astype(s.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", att, v).reshape(B, N, h)
        proj = qlin(ctx, "attn.proj", pk, lstate, bp["attn.proj__bias"])
        s = s + g1[:, None, :] * proj
        z = _modulate(ln(s), sh2, sc2)
        f1 = qlin(z, "mlp.fc1", pk, lstate, bp["mlp.fc1__bias"])
        f1 = jax.nn.gelu(f1.astype(jnp.float32)).astype(s.dtype)
        f2 = qlin(f1, "mlp.fc2", pk, lstate, bp["mlp.fc2__bias"])
        s = s + g2[:, None, :] * f2
        return s, None

    bias_params = {
        k: v for k, v in params["blocks"].items() if k.endswith("__bias")
    }
    s, _ = jax.lax.scan(block, s, (bias_params, packed, act_state))
    fin = jax.nn.silu(c.astype(jnp.float32)).astype(cfg.dtype) @ params["final_mod"].T.astype(cfg.dtype)
    fsh, fsc = jnp.split(fin, 2, axis=-1)
    s = _modulate(ln(s), fsh, fsc)
    out = s @ params["final_proj"].T.astype(cfg.dtype)
    return unpatchify(out, cfg.img_size, cfg.patch_size, cfg.in_channels)


def quantize_dit(
    cfg: DiTConfig,
    params: dict,
    quant_cfg,
    calib_batches,  # iterable of (x, t) tuples
):
    """PTQ for DiT: max calibration over (latents, timestep) batches."""
    from ..quant.config import get_preset

    qcfg = get_preset(quant_cfg) if isinstance(quant_cfg, str) else quant_cfg
    layout = build_layout(cfg, qcfg)
    qstate = init_quant_state(cfg, layout)
    step = jax.jit(
        lambda p, x, t, q: forward(cfg, p, x, t, layout=layout, qstate=q, calib=True)[1]
    )
    for x, t in calib_batches:
        new = step(params, x, t, qstate)
        merged = dict(qstate)
        merged.update(new)
        qstate = merged
    return layout, qstate

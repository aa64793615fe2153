"""Latent-diffusion UNet with quantized convolutions.

Re-creates the reference's diffusers UNet coverage
(`quantization/plugins/diffusion/diffusers.py`, `nn/modules/quant_conv.py:29`
QuantConv2d): a ResBlock/attention UNet backbone whose convolutions and
linears carry weight+input quantizers, calibrated and fake-quantized through
the same QuantizerConfig machinery as the LLM path.

TPU-first notes:
 - Convs run in NHWC with HWIO kernels via `lax.conv_general_dilated` —
   XLA lowers this as implicit GEMM onto the MXU (the TPU equivalent of the
   reference's implicit-GEMM conv kernels).
 - Weights are stored [O, I, kh, kw] (torch layout, for export parity) and
   quantized on the flattened [O, I*kh*kw] view: per-output-channel or
   blockwise configs apply exactly as they do to linear weights.
 - Upsampling is nearest-x2 + conv (the diffusers Upsample2D scheme) so no
   ConvTranspose is needed on the hot path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..quant import quantizer as Q
from ..quant.quantizer import QuantizerState
from . import dit, llama


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    base_channels: int = 32
    ch_mult: tuple[int, ...] = (1, 2)
    num_res_blocks: int = 1
    time_dim: int = 64
    groups: int = 8
    num_heads: int = 2
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**kw) -> "UNetConfig":
        base = dict(in_channels=4, base_channels=16, ch_mult=(1, 2),
                    num_res_blocks=1, time_dim=32, groups=4, num_heads=2)
        base.update(kw)
        return UNetConfig(**base)

    @property
    def chs(self) -> tuple[int, ...]:
        return tuple(self.base_channels * m for m in self.ch_mult)


def _plan(cfg: UNetConfig) -> list[tuple[str, str, tuple]]:
    """(name, kind, shape) for every learnable op, in forward order.
    kind: conv3 (3x3), conv1 (1x1), dense. Shapes are [O, I(, kh, kw)]."""
    p: list[tuple[str, str, tuple]] = []
    C = cfg.base_channels
    p.append(("time.fc1", "dense", (cfg.time_dim, cfg.time_dim)))
    p.append(("time.fc2", "dense", (cfg.time_dim, cfg.time_dim)))
    p.append(("conv_in", "conv3", (C, cfg.in_channels, 3, 3)))

    def res(name, cin, cout):
        p.append((f"{name}.conv1", "conv3", (cout, cin, 3, 3)))
        p.append((f"{name}.temb", "dense", (cout, cfg.time_dim)))
        p.append((f"{name}.conv2", "conv3", (cout, cout, 3, 3)))
        if cin != cout:
            p.append((f"{name}.skip", "conv1", (cout, cin, 1, 1)))

    chs = cfg.chs
    cur = C
    for l, c in enumerate(chs):
        for r in range(cfg.num_res_blocks):
            res(f"down.{l}.res{r}", cur, c)
            cur = c
        if l < len(chs) - 1:
            p.append((f"down.{l}.downsample", "conv3", (c, c, 3, 3)))
    res("mid.res0", cur, cur)
    for nm in ("q", "k", "v", "o"):
        p.append((f"mid.attn.{nm}", "dense", (cur, cur)))
    res("mid.res1", cur, cur)
    for l in reversed(range(len(chs))):
        c = chs[l]
        for r in range(cfg.num_res_blocks + 1):
            # skip-connection concat doubles the input channels
            skip_c = _skip_channels(cfg, l, r)
            res(f"up.{l}.res{r}", cur + skip_c, c)
            cur = c
        if l > 0:
            p.append((f"up.{l}.upsample", "conv3", (c, c, 3, 3)))
    p.append(("conv_out", "conv3", (cfg.in_channels, cur, 3, 3)))
    return p


def _skip_channels(cfg: UNetConfig, level: int, r: int) -> int:
    """Channel count of the skip tensor popped by up-block (level, r)."""
    chs = cfg.chs
    stack: list[int] = [cfg.base_channels]
    for l, c in enumerate(chs):
        for _ in range(cfg.num_res_blocks):
            stack.append(c)
        if l < len(chs) - 1:
            stack.append(c)
    # pops happen in up-path order: level len-1 .. 0, r = 0..num_res_blocks
    pops = 0
    for l in reversed(range(len(chs))):
        for rr in range(cfg.num_res_blocks + 1):
            pops += 1
            if l == level and rr == r:
                return stack[-pops]
    raise AssertionError


def init_params(cfg: UNetConfig, key: jax.Array) -> dict:
    plan = _plan(cfg)
    keys = jax.random.split(key, len(plan))
    params: dict = {}
    for k, (name, kind, shape) in zip(keys, plan):
        fan_in = int(jnp.prod(jnp.asarray(shape[1:])))
        w = jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)
        params[name] = w.astype(cfg.dtype)
        params[f"{name}__bias"] = jnp.zeros((shape[0],), cfg.dtype)
    # conv_out zero-init (diffusers zero-module convention)
    params["conv_out"] = jnp.zeros_like(params["conv_out"])
    return params


def build_layout(cfg: UNetConfig, qcfg) -> llama.QuantLayout:
    """One quantizer site per conv/linear (QuantConv2d/QuantLinear parity)."""
    sites = {}
    for name, kind, _ in _plan(cfg):
        sites[f"{name}.weight"] = qcfg.resolve(f"{name}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{name}.input_quantizer")
    return llama.QuantLayout(sites=tuple(sites.items()))


def _group_norm(x: jax.Array, groups: int, eps: float = 1e-5) -> jax.Array:
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups).astype(jnp.float32)
    mu = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    return ((g - mu) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C).astype(x.dtype)


def _fq(x, w, name, layout, lstate, calib, sub_out):
    """Fake-quant (input, weight) at a site; returns (x, w_eff)."""
    icfg = layout.get(f"{name}.input")
    wcfg = layout.get(f"{name}.weight")
    sub = dict((lstate or {}).get(name, {}))
    wq = w.reshape(w.shape[0], -1)  # convs quantize on [O, I*kh*kw]
    if icfg.enable or sub.get("input") is not None:
        st = sub.get("input")
        if calib:
            sub["input"] = Q.collect(
                x.reshape(-1, x.shape[-1]), icfg,
                st if st is not None else QuantizerState())
        else:
            x = Q.quantize(x, icfg, st)
    if wcfg.enable:
        st = sub.get("weight")
        if calib:
            sub["weight"] = Q.collect(wq, wcfg, st if st is not None else QuantizerState())
        else:
            wq = Q.quantize(wq, wcfg, st)
    if sub:
        sub_out[name] = sub
    return x, wq.reshape(w.shape)


def _conv(x, params, name, layout, lstate, calib, sub_out, stride=1):
    w = params[name]
    x, w = _fq(x, w, name, layout, lstate, calib, sub_out)
    # [O, I, kh, kw] -> HWIO; NHWC conv = implicit GEMM on the MXU
    w_hwio = jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype)
    pad = "SAME" if w.shape[-1] > 1 else "VALID"
    y = jax.lax.conv_general_dilated(
        x, w_hwio, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params[f"{name}__bias"].astype(y.dtype)


def _dense(x, params, name, layout, lstate, calib, sub_out):
    w = params[name]
    x, w = _fq(x, w, name, layout, lstate, calib, sub_out)
    return x @ w.T.astype(x.dtype) + params[f"{name}__bias"].astype(x.dtype)


def _resblock(x, temb, params, name, cfg, layout, lstate, calib, sub_out):
    cout = params[f"{name}.conv1"].shape[0]
    h = _conv(jax.nn.silu(_group_norm(x, cfg.groups).astype(jnp.float32)).astype(x.dtype),
              params, f"{name}.conv1", layout, lstate, calib, sub_out)
    h = h + _dense(jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype), params,
                   f"{name}.temb", layout, lstate, calib, sub_out)[:, None, None, :]
    h = _conv(jax.nn.silu(_group_norm(h, cfg.groups).astype(jnp.float32)).astype(h.dtype),
              params, f"{name}.conv2", layout, lstate, calib, sub_out)
    if x.shape[-1] != cout:
        x = _conv(x, params, f"{name}.skip", layout, lstate, calib, sub_out)
    return x + h


def _mid_attention(x, params, cfg, layout, lstate, calib, sub_out):
    B, H, W, C = x.shape
    n, hd = cfg.num_heads, C // cfg.num_heads
    h = _group_norm(x, cfg.groups).reshape(B, H * W, C)
    q = _dense(h, params, "mid.attn.q", layout, lstate, calib, sub_out)
    k = _dense(h, params, "mid.attn.k", layout, lstate, calib, sub_out)
    v = _dense(h, params, "mid.attn.v", layout, lstate, calib, sub_out)
    q = q.reshape(B, H * W, n, hd)
    k = k.reshape(B, H * W, n, hd)
    v = v.reshape(B, H * W, n, hd)
    s = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s / math.sqrt(hd), axis=-1).astype(x.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", p, v).reshape(B, H * W, C)
    o = _dense(o, params, "mid.attn.o", layout, lstate, calib, sub_out)
    return x + o.reshape(B, H, W, C)


def forward(
    cfg: UNetConfig,
    params: dict,
    x: jax.Array,  # [B, H, W, in_channels] latents, NHWC
    t: jax.Array,  # [B] int timesteps
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
):
    """Predict noise eps. Returns (eps [B,H,W,C_in], new_qstate)."""
    if layout is None:
        layout = llama.QuantLayout(sites=())
    sub_out: dict = {}
    temb = dit.timestep_embedding(t, cfg.time_dim).astype(cfg.dtype)
    temb = _dense(temb, params, "time.fc1", layout, qstate, calib, sub_out)
    temb = _dense(jax.nn.silu(temb.astype(jnp.float32)).astype(cfg.dtype),
                  params, "time.fc2", layout, qstate, calib, sub_out)

    h = _conv(x.astype(cfg.dtype), params, "conv_in", layout, qstate, calib, sub_out)
    skips = [h]
    chs = cfg.chs
    for l in range(len(chs)):
        for r in range(cfg.num_res_blocks):
            h = _resblock(h, temb, params, f"down.{l}.res{r}", cfg, layout,
                          qstate, calib, sub_out)
            skips.append(h)
        if l < len(chs) - 1:
            h = _conv(h, params, f"down.{l}.downsample", layout, qstate, calib,
                      sub_out, stride=2)
            skips.append(h)

    h = _resblock(h, temb, params, "mid.res0", cfg, layout, qstate, calib, sub_out)
    h = _mid_attention(h, params, cfg, layout, qstate, calib, sub_out)
    h = _resblock(h, temb, params, "mid.res1", cfg, layout, qstate, calib, sub_out)

    for l in reversed(range(len(chs))):
        for r in range(cfg.num_res_blocks + 1):
            sk = skips.pop()
            if sk.shape[1] != h.shape[1]:  # spatial mismatch after downsample
                h = jax.image.resize(h, sk.shape[:3] + (h.shape[-1],), "nearest")
            h = _resblock(jnp.concatenate([h, sk], axis=-1), temb, params,
                          f"up.{l}.res{r}", cfg, layout, qstate, calib, sub_out)
        if l > 0:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
            h = _conv(h, params, f"up.{l}.upsample", layout, qstate, calib, sub_out)

    h = jax.nn.silu(_group_norm(h, cfg.groups).astype(jnp.float32)).astype(h.dtype)
    eps = _conv(h, params, "conv_out", layout, qstate, calib, sub_out)
    return eps, (sub_out if sub_out else None)


def quantize_unet(cfg: UNetConfig, params: dict, quant_cfg, calib_batches):
    """PTQ for the UNet: max calibration over (latents, timestep) batches
    (the `mtq.quantize(unet, ...)` analog from the diffusers examples)."""
    from ..quant.config import get_preset

    qcfg = get_preset(quant_cfg) if isinstance(quant_cfg, str) else quant_cfg
    layout = build_layout(cfg, qcfg)
    qstate: dict = {}
    step = jax.jit(
        lambda p, x, t, q: forward(cfg, p, x, t, layout=layout, qstate=q or None,
                                   calib=True)[1],
        static_argnames=(),
    )
    for x, t in calib_batches:
        new = forward(cfg, params, x, t, layout=layout, qstate=qstate or None,
                      calib=True)[1]
        qstate.update(new or {})
    return layout, qstate

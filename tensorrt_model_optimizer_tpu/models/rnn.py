"""Quantized recurrent networks (LSTM/GRU).

Re-creates the reference's QuantRNN coverage (`nn/modules/quant_rnn.py`,
527 LoC: QuantLSTM/QuantRNNBase with per-gate weight quantizers): recurrent
cells whose input->hidden and hidden->hidden projections carry weight+input
quantizers through the standard QuantizerConfig machinery.

TPU-first: time steps run under `lax.scan` (one compiled cell body), the
gate matmuls are a single fused [4H, D] GEMM per step onto the MXU, and
weights are fake-quantized ONCE outside the scan (the quantizer is static
over time — matching the reference, which quantizes weights per forward,
not per step).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..quant import quantizer as Q
from ..quant.quantizer import QuantizerState
from . import llama


@dataclasses.dataclass(frozen=True)
class RNNConfig:
    input_size: int = 32
    hidden_size: int = 64
    num_layers: int = 2
    cell: str = "lstm"  # "lstm" | "gru"
    dtype: Any = jnp.float32

    @property
    def gates(self) -> int:
        return 4 if self.cell == "lstm" else 3

    @staticmethod
    def tiny(**kw) -> "RNNConfig":
        base = dict(input_size=16, hidden_size=32, num_layers=2)
        base.update(kw)
        return RNNConfig(**base)


def init_params(cfg: RNNConfig, key: jax.Array) -> dict:
    params = {}
    keys = jax.random.split(key, cfg.num_layers * 2)
    G = cfg.gates
    for i in range(cfg.num_layers):
        d_in = cfg.input_size if i == 0 else cfg.hidden_size
        H = cfg.hidden_size
        params[f"layers.{i}.wx"] = (
            jax.random.normal(keys[2 * i], (G * H, d_in), jnp.float32)
            / math.sqrt(d_in)).astype(cfg.dtype)
        params[f"layers.{i}.wh"] = (
            jax.random.normal(keys[2 * i + 1], (G * H, H), jnp.float32)
            / math.sqrt(H)).astype(cfg.dtype)
        params[f"layers.{i}.bias"] = jnp.zeros((G * H,), cfg.dtype)
    return params


def build_layout(cfg: RNNConfig, qcfg) -> llama.QuantLayout:
    sites = {}
    for i in range(cfg.num_layers):
        for w in ("wx", "wh"):
            name = f"layers.{i}.{w}"
            sites[f"{name}.weight"] = qcfg.resolve(f"{name}.weight_quantizer")
            sites[f"{name}.input"] = qcfg.resolve(f"{name}.input_quantizer")
    return llama.QuantLayout(sites=tuple(sites.items()))


def _prep_weight(w, name, layout, lstate, calib, sub_out):
    wcfg = layout.get(f"{name}.weight")
    sub = dict((lstate or {}).get(name, {}))
    if wcfg.enable:
        st = sub.get("weight")
        if calib:
            sub["weight"] = Q.collect(w, wcfg, st if st is not None else QuantizerState())
        else:
            w = Q.quantize(w, wcfg, st)
    if sub:
        sub_out[name] = sub
    return w


def _prep_input(x, name, layout, lstate, calib, sub_out):
    icfg = layout.get(f"{name}.input")
    sub = sub_out.setdefault(name, dict((lstate or {}).get(name, {}))) \
        if (icfg.enable or (lstate or {}).get(name, {}).get("input") is not None) \
        else None
    if sub is None:
        return x
    st = sub.get("input")
    if calib:
        sub["input"] = Q.collect(x.reshape(-1, x.shape[-1]), icfg,
                                 st if st is not None else QuantizerState())
        return x
    return Q.quantize(x, icfg, st)


def forward(
    cfg: RNNConfig,
    params: dict,
    x: jax.Array,  # [B, T, input_size]
    *,
    layout: Optional[llama.QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
    h0: Optional[jax.Array] = None,
):
    """Returns (outputs [B, T, H], final hidden [L, B, H], new_qstate)."""
    if layout is None:
        layout = llama.QuantLayout(sites=())
    B, T, _ = x.shape
    H = cfg.hidden_size
    sub_out: dict = {}
    seq = x.astype(cfg.dtype)
    finals = []
    for i in range(cfg.num_layers):
        wx = _prep_weight(params[f"layers.{i}.wx"], f"layers.{i}.wx",
                          layout, qstate, calib, sub_out)
        wh = _prep_weight(params[f"layers.{i}.wh"], f"layers.{i}.wh",
                          layout, qstate, calib, sub_out)
        b = params[f"layers.{i}.bias"]
        # input quantizer calibrates/applies on the whole sequence (one site)
        seq = _prep_input(seq, f"layers.{i}.wx", layout, qstate, calib, sub_out)
        # hoist the input GEMM out of the scan: [B*T, G*H] in one MXU pass
        x_proj = (seq.reshape(B * T, -1) @ wx.T.astype(seq.dtype)).reshape(B, T, -1)

        if cfg.cell == "lstm":
            def cell(carry, xp):
                h, c = carry
                g = xp + h @ wh.T.astype(h.dtype) + b.astype(h.dtype)
                ii, ff, gg, oo = jnp.split(g.astype(jnp.float32), 4, axis=-1)
                c = jax.nn.sigmoid(ff) * c + jax.nn.sigmoid(ii) * jnp.tanh(gg)
                h = (jax.nn.sigmoid(oo) * jnp.tanh(c)).astype(xp.dtype)
                return (h, c), h

            init = (jnp.zeros((B, H), cfg.dtype) if h0 is None else h0[i],
                    jnp.zeros((B, H), jnp.float32))
            (hT, _), outs = jax.lax.scan(cell, init, jnp.swapaxes(x_proj, 0, 1))
        else:  # gru
            def cell(carry, xp):
                h = carry
                hp = h @ wh.T.astype(h.dtype) + b.astype(h.dtype)
                xr, xz, xn = jnp.split(xp.astype(jnp.float32), 3, axis=-1)
                hr, hz, hn = jnp.split(hp.astype(jnp.float32), 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h = ((1 - z) * n + z * h.astype(jnp.float32)).astype(xp.dtype)
                return h, h

            init = jnp.zeros((B, H), cfg.dtype) if h0 is None else h0[i]
            hT, outs = jax.lax.scan(cell, init, jnp.swapaxes(x_proj, 0, 1))
        seq = jnp.swapaxes(outs, 0, 1)
        finals.append(hT)
    return seq, jnp.stack(finals), (sub_out if sub_out else None)


def quantize_rnn(cfg: RNNConfig, params: dict, quant_cfg, calib_batches):
    """PTQ for RNNs: max calibration over input batches."""
    from ..quant.config import get_preset

    qcfg = get_preset(quant_cfg) if isinstance(quant_cfg, str) else quant_cfg
    layout = build_layout(cfg, qcfg)
    qstate: dict = {}
    for x in calib_batches:
        _, _, st = forward(cfg, params, x, layout=layout,
                           qstate=qstate or None, calib=True)
        qstate.update(st or {})
    return layout, qstate

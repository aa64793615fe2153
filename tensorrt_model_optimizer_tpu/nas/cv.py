"""FastNAS / GradNAS for convolutional (CV) models.

Re-creates the reference's CV pruning flow (`prune/fastnas.py:327`
FastNASPatternSearcher, `prune/gradnas.py` gradient-based scoring): a small
quantizable ConvNet classifier, per-channel importance (magnitude or
gradient-squared), and a binary search over uniform width ratios under a
validation-loss budget.

The conv/dense quantization sites reuse the UNet machinery
(`models/unet._conv` / `_dense`), so a pruned CV model PTQs exactly like any
other model family.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama, unet
from ..opt.searcher import binary_search


@dataclasses.dataclass(frozen=True)
class CVConfig:
    in_channels: int = 3
    widths: tuple[int, ...] = (16, 32)
    num_classes: int = 10
    groups: int = 4
    dtype: object = jnp.float32

    @staticmethod
    def tiny(**kw) -> "CVConfig":
        base = dict(in_channels=3, widths=(8, 16), num_classes=10, groups=4)
        base.update(kw)
        return CVConfig(**base)


def _plan(cfg: CVConfig):
    p = []
    cin = cfg.in_channels
    for i, w in enumerate(cfg.widths):
        p.append((f"stage{i}.conv", "conv3", (w, cin, 3, 3)))
        p.append((f"stage{i}.down", "conv3", (w, w, 3, 3)))  # stride-2
        cin = w
    p.append(("head", "dense", (cfg.num_classes, cin)))
    return p


def init_params(cfg: CVConfig, key: jax.Array) -> dict:
    plan = _plan(cfg)
    keys = jax.random.split(key, len(plan))
    params = {}
    for k, (name, kind, shape) in zip(keys, plan):
        fan = int(np.prod(shape[1:]))
        params[name] = (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan)).astype(cfg.dtype)
        params[f"{name}__bias"] = jnp.zeros((shape[0],), cfg.dtype)
    return params


def build_layout(cfg: CVConfig, qcfg) -> llama.QuantLayout:
    sites = {}
    for name, kind, _ in _plan(cfg):
        sites[f"{name}.weight"] = qcfg.resolve(f"{name}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{name}.input_quantizer")
    return llama.QuantLayout(sites=tuple(sites.items()))


def forward(cfg: CVConfig, params: dict, x: jax.Array, *,
            layout=None, qstate=None, calib: bool = False):
    """Classifier logits [B, num_classes]. x is [B, H, W, in_channels]."""
    if layout is None:
        layout = llama.QuantLayout(sites=())
    sub: dict = {}
    h = x.astype(cfg.dtype)
    for i in range(len(cfg.widths)):
        h = unet._conv(h, params, f"stage{i}.conv", layout, qstate, calib, sub)
        h = jax.nn.silu(unet._group_norm(h, cfg.groups).astype(jnp.float32)).astype(h.dtype)
        h = unet._conv(h, params, f"stage{i}.down", layout, qstate, calib, sub, stride=2)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    pooled = jnp.mean(h, axis=(1, 2))
    logits = unet._dense(pooled, params, "head", layout, qstate, calib, sub)
    return logits.astype(jnp.float32), (sub if sub else None)


def _ce(logits, labels):
    lp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))


def magnitude_scores(cfg: CVConfig, params: dict) -> dict:
    """Per-out-channel L2 of each prunable conv (FastNAS importance)."""
    return {
        f"stage{i}.conv": np.asarray(
            jnp.sqrt(jnp.sum(params[f"stage{i}.conv"].astype(jnp.float32) ** 2,
                             axis=(1, 2, 3))))
        for i in range(len(cfg.widths))
    }


def gradnas_scores(cfg: CVConfig, params: dict, batches) -> dict:
    """GradNAS importance: accumulated squared loss-gradient per out-channel
    (`prune/gradnas.py` — gradient-based Hparam scoring)."""
    def loss(p, x, y):
        lg, _ = forward(cfg, p, x)
        return _ce(lg, y)

    g_fn = jax.jit(jax.grad(loss))
    acc = {f"stage{i}.conv": 0.0 for i in range(len(cfg.widths))}
    for x, y in batches:
        g = g_fn(params, x, y)
        for name in acc:
            acc[name] = acc[name] + jnp.sum(g[name].astype(jnp.float32) ** 2,
                                            axis=(1, 2, 3))
    return {k: np.asarray(v) for k, v in acc.items()}


def slice_model(cfg: CVConfig, params: dict, scores: dict, ratio: float):
    """Keep the top `ratio` channels of every stage (importance-ordered)."""
    new_w = tuple(max(int(w * ratio) // 4 * 4, 4) for w in cfg.widths)
    new_params = dict(params)
    prev_keep = None
    for i, w in enumerate(new_w):
        keep = np.sort(np.argsort(-scores[f"stage{i}.conv"])[:w])
        conv = params[f"stage{i}.conv"]
        if prev_keep is not None:
            conv = conv[:, prev_keep]
        new_params[f"stage{i}.conv"] = conv[keep]
        new_params[f"stage{i}.conv__bias"] = params[f"stage{i}.conv__bias"][keep]
        new_params[f"stage{i}.down"] = params[f"stage{i}.down"][keep][:, keep]
        new_params[f"stage{i}.down__bias"] = params[f"stage{i}.down__bias"][keep]
        prev_keep = keep
    new_params["head"] = params["head"][:, prev_keep]
    new_cfg = dataclasses.replace(cfg, widths=new_w)
    return new_cfg, new_params


def fastnas_prune(
    cfg: CVConfig,
    params: dict,
    batches,  # [(x [B,H,W,C], labels [B])]
    max_loss_increase: float = 0.10,
    steps: int = 6,
    score_mode: str = "magnitude",  # or "gradnas"
):
    """Binary-search the smallest uniform width ratio within the loss budget
    (the `mtp.prune(mode="fastnas")` analog for CV)."""
    scores = (gradnas_scores(cfg, params, batches) if score_mode == "gradnas"
              else magnitude_scores(cfg, params))
    base = sum(float(_ce(forward(cfg, params, x)[0], y)) for x, y in batches[:2])

    def feasible(ratio: float) -> bool:
        sub_cfg, sub = slice_model(cfg, params, scores, ratio)
        loss = sum(float(_ce(forward(sub_cfg, sub, x)[0], y)) for x, y in batches[:2])
        return loss <= base * (1 + max_loss_increase)

    best_cut = binary_search(0.0, 0.75, lambda cut: feasible(1.0 - cut), steps=steps)
    ratio = 1.0 - best_cut
    sub_cfg, sub = slice_model(cfg, params, scores, ratio)
    return sub_cfg, sub, ratio

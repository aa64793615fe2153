"""AutoNAS tests: convert/profile/materialize/search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.nas import autonas


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(num_hidden_layers=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


def test_profile(setup):
    cfg, params, _ = setup
    p = autonas.profile(cfg)
    assert p["params"] > 0 and p["flops_per_token"] > 0
    smaller = autonas.profile(
        llama.LlamaConfig.tiny(num_hidden_layers=2))
    assert smaller["params"] < p["params"]


def test_convert_space(setup):
    cfg, _, _ = setup
    space = autonas.convert(cfg)
    assert "depth" in space.hparams
    assert space.size() > 1


def test_materialize_full_config_is_exact(setup):
    from tensorrt_model_optimizer_tpu.prune import minitron

    cfg, params, batches = setup
    scores = minitron.importance(cfg, params, batches, capture_tokens=16)
    full_config = {f"layers.{i}.ffn": cfg.intermediate_size for i in range(4)}
    full_config["depth"] = 4
    sub_cfg, sub_params = autonas.materialize(cfg, params, scores, full_config)
    ref, _, _ = llama.forward(cfg, params, batches[0])
    out, _, _ = llama.forward(sub_cfg, sub_params, batches[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_search(setup):
    cfg, params, batches = setup
    space = autonas.convert(cfg, ffn_ratios=(0.5, 1.0))
    state, best_cfg, best_params = autonas.search(
        cfg, params, space, batches, param_budget_ratio=0.9, iterations=6)
    assert state.best_config is not None
    logits, _, _ = llama.forward(best_cfg, best_params, batches[0])
    assert np.all(np.isfinite(np.asarray(logits)))


def test_fastnas_prune(setup):
    cfg, params, batches = setup
    sub_cfg, sub_params, ratio = autonas.fastnas_prune(
        cfg, params, batches, max_loss_increase=0.10, steps=4)
    assert 0.1 <= ratio <= 1.0
    logits, _, _ = llama.forward(sub_cfg, sub_params, batches[0])
    assert np.all(np.isfinite(np.asarray(logits)))


class TestFastNASCV:
    def _data(self, cfg, n=2):
        rng = np.random.default_rng(0)
        return [
            (jnp.asarray(rng.normal(size=(4, 16, 16, cfg.in_channels)).astype(np.float32)),
             jnp.asarray(rng.integers(0, cfg.num_classes, 4)))
            for _ in range(n)
        ]

    def test_forward_and_quantize(self):
        from tensorrt_model_optimizer_tpu.nas import cv
        from tensorrt_model_optimizer_tpu.quant.config import get_preset

        cfg = cv.CVConfig.tiny()
        params = cv.init_params(cfg, jax.random.PRNGKey(0))
        batches = self._data(cfg)
        logits, _ = cv.forward(cfg, params, batches[0][0])
        assert logits.shape == (4, cfg.num_classes)
        # PTQ through the same machinery
        layout = cv.build_layout(cfg, get_preset("INT8_DEFAULT_CFG"))
        qstate = {}
        _, st = cv.forward(cfg, params, batches[0][0], layout=layout,
                           qstate=None, calib=True)
        qstate.update(st)
        q_logits, _ = cv.forward(cfg, params, batches[0][0], layout=layout, qstate=qstate)
        corr = np.corrcoef(np.asarray(q_logits).ravel(), np.asarray(logits).ravel())[0, 1]
        assert corr > 0.99, corr

    @pytest.mark.parametrize("mode", ["magnitude", "gradnas"])
    def test_fastnas_prune_cv(self, mode):
        from tensorrt_model_optimizer_tpu.nas import cv

        cfg = cv.CVConfig.tiny(widths=(16, 32))
        params = cv.init_params(cfg, jax.random.PRNGKey(0))
        batches = self._data(cfg)
        sub_cfg, sub, ratio = cv.fastnas_prune(cfg, params, batches,
                                               max_loss_increase=0.5, steps=4,
                                               score_mode=mode)
        assert ratio <= 1.0
        assert all(w <= wo for w, wo in zip(sub_cfg.widths, cfg.widths))
        logits, _ = cv.forward(sub_cfg, sub, batches[0][0])
        assert np.isfinite(np.asarray(logits)).all()

    def test_slice_preserves_top_channels(self):
        from tensorrt_model_optimizer_tpu.nas import cv

        cfg = cv.CVConfig.tiny(widths=(8, 8))
        params = cv.init_params(cfg, jax.random.PRNGKey(0))
        scores = cv.magnitude_scores(cfg, params)
        sub_cfg, sub = cv.slice_model(cfg, params, scores, 0.5)
        keep = np.sort(np.argsort(-scores["stage0.conv"])[:4])
        np.testing.assert_allclose(
            np.asarray(sub["stage0.conv__bias"]),
            np.asarray(params["stage0.conv__bias"][keep]))

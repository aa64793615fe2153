"""QAT trainer loop: quantize-on-first-step, checkpoint cadence, resume
(reference `plugins/transformers.py:503` QATTrainer semantics)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.opt.trainer import QATTrainer, TrainerConfig


@pytest.fixture()
def setup(tmp_path):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [rng.integers(0, 256, size=(2, 17)) for _ in range(24)]
    return cfg, params, batches, str(tmp_path / "out")


def test_quantize_on_first_step_and_train(setup):
    cfg, params, batches, out = setup
    t = QATTrainer(
        cfg, params,
        TrainerConfig(output_dir=out, max_steps=8, save_steps=4,
                      eval_steps=4, quant_preset="INT8_DEFAULT_CFG",
                      calib_batches=2),
        eval_batches=batches[:2],
    )
    model = t.train(iter(batches))
    assert t.step == 8
    assert model.qstate  # calibrated on first step
    assert any("ppl" in h for h in t.history)
    # checkpoints at 4 and 8
    assert os.path.isdir(os.path.join(out, "checkpoint-4"))
    assert os.path.isdir(os.path.join(out, "checkpoint-8"))


def test_resume_continues_from_latest(setup):
    cfg, params, batches, out = setup
    tc = TrainerConfig(output_dir=out, max_steps=6, save_steps=3,
                       quant_preset="INT8_DEFAULT_CFG", calib_batches=2,
                       eval_steps=0)
    t = QATTrainer(cfg, params, tc)
    t.train(iter(batches[:8]))
    assert t.step == 6

    t2 = QATTrainer(cfg, params, TrainerConfig(
        output_dir=out, max_steps=10, save_steps=3,
        quant_preset="INT8_DEFAULT_CFG", eval_steps=0))
    assert t2.resume()
    assert t2.step == 6
    model = t2.train(iter(batches[8:]))
    assert t2.step == 10
    # training moved the weights vs the checkpoint it resumed from
    from tensorrt_model_optimizer_tpu.opt import state as mto

    old = mto.restore(os.path.join(out, "checkpoint-6"))
    d = np.abs(
        np.asarray(model.params["layers"]["mlp.gate_proj"])
        - np.asarray(old.params["layers"]["mlp.gate_proj"])
    ).max()
    assert d > 0


def test_resume_without_checkpoints(setup):
    cfg, params, _, out = setup
    t = QATTrainer(cfg, params, TrainerConfig(output_dir=out))
    assert not t.resume()

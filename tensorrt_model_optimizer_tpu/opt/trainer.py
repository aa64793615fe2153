"""QAT trainer loop (the `plugins/transformers.py:503` QATTrainer analog).

The reference wraps the HF Trainer with modelopt semantics: quantize on the
first training step (if the model isn't already), save modelopt state with
every checkpoint, restore from the latest checkpoint on resume, and run an
eval cadence. Here the same loop is a plain functional driver around
`quant.qat.make_optax_train_step`:

 - **quantize-on-first-step**: pass a bf16 model + a preset; calibration
   runs on the first `cadence` batches before any gradient step (the
   reference's `_quantize_model` on first step).
 - **checkpoint cadence**: `opt.state.save` (replayable modelopt state +
   weights) every `save_steps`; `resume()` restores the latest checkpoint
   and continues from its recorded step — interrupted QAT jobs continue
   exactly (the failure-recovery surface of SURVEY §5).
 - **eval cadence**: held-out ppl each `eval_steps` through the fake-quant
   model (params as jit args; never captured — relay safety).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..quant import ptq
from ..quant.qat import make_optax_train_step
from . import state as mto


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str
    max_steps: int = 1000
    save_steps: int = 200
    eval_steps: int = 100
    learning_rate: float = 1e-4
    train_amax: bool = False  # LSQ-style learned amax
    quant_preset: Optional[str] = None  # quantize-on-first-step if given
    calib_batches: int = 4


class QATTrainer:
    """Functional QAT loop with checkpoint/resume and eval cadence."""

    def __init__(
        self,
        cfg: llama.LlamaConfig,
        params: llama.Params,
        tcfg: TrainerConfig,
        eval_batches: Optional[list] = None,
        optimizer=None,
    ):
        import optax

        self.cfg = cfg
        self.tcfg = tcfg
        self.eval_batches = eval_batches or []
        self.model: Optional[ptq.QuantizedModel] = None
        self.params = params
        self.step = 0
        self.history: list[dict] = []
        self._optimizer = optimizer or optax.adam(tcfg.learning_rate)
        self._step_fn = None
        self._opt_state = None

    # ---- quantize-on-first-step -----------------------------------------

    def _ensure_quantized(self, first_batches: list):
        if self.model is not None:
            return
        if self.tcfg.quant_preset is None:
            raise ValueError("pass quant_preset or a pre-quantized model")
        calib = first_batches[: self.tcfg.calib_batches]
        self.model = ptq.quantize(self.cfg, self.params, self.tcfg.quant_preset, calib)

    def attach_quantized(self, model: ptq.QuantizedModel):
        self.model = model
        self.params = model.params

    # ---- the loop ---------------------------------------------------------

    def train(self, batches: Iterable[Any]) -> ptq.QuantizedModel:
        batches = iter(batches)
        if self.model is None:
            head = []
            for _ in range(self.tcfg.calib_batches):
                try:
                    head.append(next(batches))
                except StopIteration:
                    break
            self._ensure_quantized(head)
            # calibration batches are reused as training data afterwards
            import itertools

            batches = itertools.chain(head, batches)
        m = self.model
        if self._step_fn is None:
            step_fn, init_fn = make_optax_train_step(
                self.cfg, m.layout, self._optimizer,
                train_amax=self.tcfg.train_amax,
            )
            self._step_fn = jax.jit(step_fn)
            self._opt_state = init_fn(m.params, m.qstate)

        p, qs = m.params, m.qstate
        for toks in batches:
            if self.step >= self.tcfg.max_steps:
                break
            p, qs, self._opt_state, loss = self._step_fn(
                p, qs, self._opt_state, jnp.asarray(toks)
            )
            self.step += 1
            if self.tcfg.eval_steps and self.step % self.tcfg.eval_steps == 0:
                self._record_eval(p, qs, float(loss))
            if self.tcfg.save_steps and self.step % self.tcfg.save_steps == 0:
                self._save(p, qs)
        self.model = dataclasses.replace(m, params=p, qstate=qs)
        self._save(p, qs)
        return self.model

    # ---- eval / checkpoint -------------------------------------------------

    def _record_eval(self, p, qs, loss: float):
        row = {"step": self.step, "loss": loss}
        if self.eval_batches:
            from ..utils.evaluate import perplexity

            row["ppl"] = perplexity(
                self.cfg, p, self.eval_batches,
                layout=self.model.layout, qstate=qs,
            )
        self.history.append(row)

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.tcfg.output_dir, f"checkpoint-{step}")

    def _save(self, p, qs):
        m = dataclasses.replace(self.model, params=p, qstate=qs)
        path = self._ckpt_dir(self.step)
        mto.save(m, path)
        with open(os.path.join(path, "trainer_state.json"), "w") as f:
            json.dump({"step": self.step, "history": self.history}, f)

    def resume(self) -> bool:
        """Restore the latest checkpoint under output_dir. Returns True if
        one was found (the QATTrainer resume-from-last-checkpoint path)."""
        if not os.path.isdir(self.tcfg.output_dir):
            return False
        ckpts = [
            d for d in os.listdir(self.tcfg.output_dir)
            if d.startswith("checkpoint-")
        ]
        if not ckpts:
            return False
        latest = max(ckpts, key=lambda d: int(d.split("-")[1]))
        path = os.path.join(self.tcfg.output_dir, latest)
        self.model = mto.restore(path)
        self.params = self.model.params
        with open(os.path.join(path, "trainer_state.json")) as f:
            st = json.load(f)
        self.step = st["step"]
        self.history = st["history"]
        self._step_fn = None  # re-init optimizer state on continue
        return True

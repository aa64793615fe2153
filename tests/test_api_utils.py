"""mtq-style API façade + perf utils tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import api
from tensorrt_model_optimizer_tpu.utils import perf


@pytest.fixture(scope="module")
def model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return api.quantize(cfg, params, "INT8_DEFAULT_CFG", batches), batches


def test_fold_weight_preserves_forward(model):
    m, batches = model
    ref, _, _ = m.forward(batches[0])
    folded = api.fold_weight(m)
    assert not folded.layout.get("mlp.down_proj.weight").enable
    out, _, _ = folded.forward(batches[0])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


def test_disable_quantizer(model):
    m, batches = model
    m2 = api.disable_quantizer(m, "*input")
    assert not m2.layout.get("mlp.up_proj.input").enable
    assert m2.layout.get("mlp.up_proj.weight").enable


def test_quantization_mse(model):
    m, _ = model
    mse = api.compute_quantization_mse(m)
    assert set(mse) == set(llama.PROJ_NAMES)
    assert all(v > 0 for v in mse.values())


def test_timer_and_tree_bytes(model):
    m, batches = model
    t = perf.Timer()
    with t.time("fwd"):
        out, _, _ = m.forward(batches[0])
    assert "fwd" in t.report()
    assert perf.tree_bytes(m.params) > 0
    stats = perf.device_memory_stats()
    assert isinstance(stats, dict)


def test_run_logger_records_and_redacts(tmp_path):
    """RunLogger: params/metrics/artifacts land in the run dir; secret-named
    params and URI userinfo are redacted (reference mlflow.py _redact)."""
    from tensorrt_model_optimizer_tpu.utils import tracking

    art = tmp_path / "thing.json"
    art.write_text("{}")
    with tracking.RunLogger(str(tmp_path / "runs"), name="t") as run:
        run.log_params({"lr": 1e-3, "api_key": "hunter2",
                        "uri": "https://user:pw@host/x"})
        run.log_metric("ppl", 3.5, step=1)
        run.log_metric("ppl", 3.1, step=2)
        run.log_artifact(str(art))
        rdir = run.dir
    import json as _json
    meta = _json.loads(open(rdir + "/meta.json").read())
    assert meta["status"] == "finished"
    assert meta["params"]["api_key"] == "***"
    assert "pw@" not in meta["params"]["uri"]
    ms = tracking.read_metrics(rdir)
    assert [m["value"] for m in ms] == [3.5, 3.1]
    assert (tmp_path / "runs").exists()
    import os as _os
    assert _os.path.exists(rdir + "/artifacts/thing.json")


def test_run_logger_failure_status(tmp_path):
    from tensorrt_model_optimizer_tpu.utils import tracking

    try:
        with tracking.RunLogger(str(tmp_path), name="f") as run:
            rdir = run.dir
            raise ValueError("boom")
    except ValueError:
        pass
    import json as _json
    assert _json.loads(open(rdir + "/meta.json").read())["status"] == "failed"


class TestFindMaxBatchSize:
    """OOM batch-size probe (reference dataset_utils.py:996 get_max_batch_size)
    against a fake workload with a known capacity — the probe must find the
    exact boundary by execution, never by memory_stats (zero on relays)."""

    @staticmethod
    def _probe(capacity, calls):
        def try_fn(b):
            calls.append(b)
            if b > capacity:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory probing")
        return try_fn

    def test_finds_exact_boundary(self):
        from tensorrt_model_optimizer_tpu.utils import memory

        for cap in (1, 2, 3, 5, 8, 13, 64, 100):
            calls = []
            assert memory.find_max_batch_size(
                self._probe(cap, calls), start=1, ceiling=128) == cap

    def test_ceiling_respected(self):
        from tensorrt_model_optimizer_tpu.utils import memory

        assert memory.find_max_batch_size(
            self._probe(10**9, []), start=2, ceiling=16) == 16

    def test_optimistic_start_backs_off(self):
        from tensorrt_model_optimizer_tpu.utils import memory

        assert memory.find_max_batch_size(
            self._probe(3, []), start=32, ceiling=64) == 3

    def test_nothing_fits_raises(self):
        from tensorrt_model_optimizer_tpu.utils import memory

        with pytest.raises(MemoryError):
            memory.find_max_batch_size(self._probe(0, []), start=4)

    def test_non_oom_errors_propagate(self):
        from tensorrt_model_optimizer_tpu.utils import memory

        def bad(b):
            raise ValueError("shape mismatch")

        with pytest.raises(ValueError):
            memory.find_max_batch_size(bad)

"""Execute the example CLIs on tiny models (the reference's tests/examples)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
ENV = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")


def run(args, timeout=420):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=ENV,
        capture_output=True, text=True, timeout=timeout,
    )


def test_hf_ptq_with_recipe(tmp_path):
    r = run(["examples/hf_ptq.py", "--model", "tiny",
             "--recipe", "nvfp4_ptq.yaml",
             "--override", "calib.num_batches=2",
             "--override", "calib.seq_len=32",
             "--export_path", str(tmp_path / "out")])
    assert r.returncode == 0, r.stderr[-800:]
    assert "exported NVFP4" in r.stdout
    assert (tmp_path / "out" / "hf_quant_config.json").exists()


def test_llm_qat(tmp_path):
    r = run(["examples/llm_qat.py", "--steps", "3", "--qformat", "FP8_DEFAULT_CFG"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "done" in r.stdout


def test_llm_sparsity():
    r = run(["examples/llm_sparsity.py", "--method", "magnitude"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "ppl" in r.stdout


def test_serve_demo():
    r = run(["examples/serve_demo.py", "--num_requests", "2",
             "--max_new_tokens", "3"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "request 1" in r.stdout


def test_diffusion_ptq_unet():
    r = run(["examples/diffusion_ptq.py", "--cpu", "--backbone", "unet",
             "--qformat", "INT8_DEFAULT_CFG", "--steps", "2"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "corr=" in r.stdout and "done" in r.stdout


def test_speculative_decoding_tree():
    r = run(["examples/speculative_decoding.py", "--cpu", "--mode", "medusa",
             "--tree", "--train_steps", "3", "--decode_steps", "4"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "TREE verify" in r.stdout


def test_moe_ptq_sharded():
    r = run(["examples/moe_ptq_sharded.py", "--cpu", "--devices", "8"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "bit-for-bit" in r.stdout and "done" in r.stdout


def test_chained_optimization():
    r = run(["examples/chained_optimization.py", "--cpu", "--heal_steps", "4"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "masks intact" in r.stdout and "exported" in r.stdout


def test_llm_eval():
    r = run(["examples/llm_eval.py", "--cpu", "--qformat", "INT8_DEFAULT_CFG"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "bf16 ppl" in r.stdout and "INT8_DEFAULT_CFG ppl" in r.stdout

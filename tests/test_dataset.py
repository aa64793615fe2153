"""Dataset utilities: loaders + OOM-probe batch sizing (dataset_utils analog)."""

import os

def test_get_max_batch_size_probe():
    from tensorrt_model_optimizer_tpu.utils.dataset import get_max_batch_size

    calls = []

    def fwd(toks):
        calls.append(toks.shape[0])
        if toks.shape[0] > 8:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        import numpy as np

        return np.zeros(())

    assert get_max_batch_size(fwd, seq_len=16, start=1) == 8
    assert calls == [1, 2, 4, 8, 16]


def test_get_max_batch_size_non_oom_errors_propagate():
    import pytest as _pytest

    from tensorrt_model_optimizer_tpu.utils.dataset import get_max_batch_size

    def fwd(toks):
        raise ValueError("shape mismatch")

    with _pytest.raises(ValueError):
        get_max_batch_size(fwd, seq_len=16)


def test_hf_dataset_loader_local(tmp_path):
    """save_to_disk roundtrip through the local-only HF loader."""
    import pytest as _pytest

    datasets = _pytest.importorskip("datasets")
    from tensorrt_model_optimizer_tpu.utils.dataset import batches_from_hf_dataset

    d = datasets.Dataset.from_dict({"text": ["hello world " * 50] * 8})
    path = str(tmp_path / "ds")
    d.save_to_disk(path)
    # tokenizer: reuse any local tokenizer dir if present, else skip
    tok_dir = os.environ.get("TOKENIZER_DIR")
    if not tok_dir:
        _pytest.skip("no local tokenizer directory available (zero egress)")
    batches = batches_from_hf_dataset(path, tok_dir, batch_size=2, seq_len=32,
                                      num_batches=2)
    assert len(batches) == 2 and batches[0].shape == (2, 32)

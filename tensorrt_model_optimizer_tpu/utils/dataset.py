"""Calibration datasets and forward loops (`utils/dataset_utils.py` analog).

Zero-egress environment: loaders work from local files (tokenized .npy,
plain text + a HF tokenizer directory) with a deterministic synthetic
fallback so every pipeline runs end-to-end without downloads.
`create_forward_loop` (`dataset_utils.py:1183`) becomes "yield token
batches" — calibration passes are data-driven, not callback-driven.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np


def synthetic_batches(
    vocab_size: int,
    num_batches: int = 8,
    batch_size: int = 2,
    seq_len: int = 512,
    seed: int = 0,
) -> list[np.ndarray]:
    """Deterministic pseudo-text: mixture of zipf-ish tokens + repeats, a
    closer statistical match to text than uniform noise."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_batches):
        ranks = rng.zipf(1.3, size=(batch_size, seq_len)).astype(np.int64)
        toks = np.clip(ranks, 1, vocab_size - 1)
        # inject local repeats (text has heavy short-range reuse)
        for b in range(batch_size):
            for _ in range(seq_len // 16):
                i = rng.integers(0, seq_len - 8)
                j = rng.integers(0, seq_len - 8)
                toks[b, j : j + 4] = toks[b, i : i + 4]
        out.append(toks.astype(np.int32))
    return out


def batches_from_tokens_file(
    path: str, batch_size: int = 2, seq_len: int = 512, max_batches: Optional[int] = None
) -> list[np.ndarray]:
    """Load a flat .npy/.bin token array and chunk it into [B, T] batches."""
    arr = np.load(path) if path.endswith(".npy") else np.fromfile(path, np.int32)
    arr = arr.reshape(-1)
    per = batch_size * seq_len
    n = len(arr) // per
    if max_batches:
        n = min(n, max_batches)
    return [
        arr[i * per : (i + 1) * per].reshape(batch_size, seq_len).astype(np.int32)
        for i in range(n)
    ]


def batches_from_text(
    text_path: str,
    tokenizer_dir: str,
    batch_size: int = 2,
    seq_len: int = 512,
    max_batches: Optional[int] = None,
) -> list[np.ndarray]:
    """Tokenize a local text file with a local HF tokenizer directory."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    with open(text_path) as f:
        ids = tok(f.read(), return_tensors="np")["input_ids"].reshape(-1)
    per = batch_size * seq_len
    n = len(ids) // per
    if max_batches:
        n = min(n, max_batches)
    return [
        ids[i * per : (i + 1) * per].reshape(batch_size, seq_len).astype(np.int32)
        for i in range(n)
    ]


def get_calib_batches(
    vocab_size: int,
    data: Optional[str] = None,
    tokenizer_dir: Optional[str] = None,
    num_batches: int = 8,
    batch_size: int = 2,
    seq_len: int = 512,
) -> list[np.ndarray]:
    """Dispatch: tokens file > text+tokenizer > synthetic."""
    if data and (data.endswith(".npy") or data.endswith(".bin")):
        return batches_from_tokens_file(data, batch_size, seq_len, num_batches)
    if data and tokenizer_dir:
        return batches_from_text(data, tokenizer_dir, batch_size, seq_len, num_batches)
    return synthetic_batches(vocab_size, num_batches, batch_size, seq_len)


def batches_from_hf_dataset(
    path: str,
    tokenizer_dir: str,
    text_field: str = "text",
    batch_size: int = 2,
    seq_len: int = 512,
    num_batches: int = 8,
    pack: bool = True,
) -> list[np.ndarray]:
    """Local HF `datasets` loader (`dataset_utils.py:745` analog).

    Zero-egress: `path` must be a local dataset directory (save_to_disk
    format) or a local file readable by `datasets` — nothing is fetched.
    With `pack=True` samples are concatenated and chunked to fixed seq_len
    (the reference's `pack` mode); otherwise each sample is truncated/padded.
    """
    from datasets import load_from_disk  # baked-in package, local only
    from transformers import AutoTokenizer

    ds = load_from_disk(path)
    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    texts = (ex[text_field] for ex in ds)
    if pack:
        ids: list[int] = []
        need = num_batches * batch_size * seq_len
        for t in texts:
            ids.extend(tok(t, add_special_tokens=False)["input_ids"])
            if len(ids) >= need:
                break
        arr = np.asarray(ids[: need // seq_len * seq_len], np.int32)
        chunks = arr.reshape(-1, seq_len)
    else:
        rows = []
        for t in texts:
            e = tok(t, add_special_tokens=False)["input_ids"][:seq_len]
            rows.append(np.pad(e, (0, seq_len - len(e))))
            if len(rows) >= num_batches * batch_size:
                break
        chunks = np.asarray(rows, np.int32)
    n = min(num_batches, len(chunks) // batch_size)
    return [chunks[i * batch_size : (i + 1) * batch_size] for i in range(n)]


def get_max_batch_size(
    forward_fn,
    seq_len: int = 512,
    vocab_size: int = 32000,
    start: int = 1,
    cap: int = 512,
    headroom: float = 0.85,
) -> int:
    """Probe the largest power-of-two batch that runs (`dataset_utils.py:996`
    `get_max_batch_size` analog).

    Doubles the batch until the forward raises a resource error (or `cap`),
    then returns the last good size scaled by `headroom` semantics of the
    reference (we keep the last power of two that fit — the reference
    reserves memory headroom the same way via its usage ratio)."""
    rng = np.random.default_rng(0)
    good = 0
    b = max(start, 1)
    while b <= cap:
        toks = rng.integers(0, vocab_size, size=(b, seq_len), dtype=np.int32)
        try:
            out = forward_fn(toks)
            import jax

            jax.block_until_ready(out)
        except Exception as e:  # RESOURCE_EXHAUSTED / XlaRuntimeError
            msg = str(e).lower()
            if "resource" in msg or "memory" in msg or "oom" in msg:
                break
            raise
        good = b
        b *= 2
    if good == 0:
        raise RuntimeError(f"even batch={start} does not fit at seq_len={seq_len}")
    del headroom  # power-of-two backoff already leaves >= 2x compute headroom
    return good


def vlm_calib_batches(n_batches: int, batch: int = 2, img: int = 64,
                      seq: int = 32, seed: int = 0):
    """Synthetic VLM calibration batches: (pixels [B, img, img, 3] in
    [-1, 1], synthlang text tokens [B, seq]).

    Reference analog: the VLM calibration loaders in
    `modelopt/torch/utils/dataset_utils.py` (image+text pairs driving the
    forward_loop for `examples/vlm_ptq`)."""
    import numpy as np

    from . import synthlang

    lang = synthlang.SynthLang(0)
    rng = np.random.default_rng(seed)
    stream = lang.token_stream(n_batches * batch * seq + seq, seed=seed + 1)
    out = []
    for i in range(n_batches):
        px = rng.uniform(-1, 1, size=(batch, img, img, 3)).astype(np.float32)
        s = i * batch * seq
        tk = stream[s: s + batch * seq].reshape(batch, seq)
        out.append((px, tk.astype(np.int32)))
    return out

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

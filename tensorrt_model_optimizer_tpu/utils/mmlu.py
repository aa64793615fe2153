"""MMLU accuracy harness (`examples/llm_eval/mmlu.py` analog).

Zero-egress: reads the standard MMLU CSV layout from a local directory
(`data_dir/{dev,test}/<subject>_{dev,test}.csv`, rows = question, A, B, C, D,
answer). Scoring follows the reference harness: build a k-shot prompt, read
the model's next-token logits at the answer position, argmax over the four
answer-letter token ids.

Tokenizer-agnostic: pass `encode(text) -> list[int]` and the four token ids
for " A" " B" " C" " D".
"""

from __future__ import annotations

import csv
import os
from typing import Callable, Iterable, Optional

import jax.numpy as jnp
import numpy as np

CHOICES = ("A", "B", "C", "D")


def format_example(row: list[str], include_answer: bool = True) -> str:
    q, a, b, c, d = row[0], row[1], row[2], row[3], row[4]
    s = f"{q}\nA. {a}\nB. {b}\nC. {c}\nD. {d}\nAnswer:"
    if include_answer:
        s += f" {row[5]}\n\n"
    return s


def build_prompt(dev_rows: list[list[str]], test_row: list[str], k_shot: int = 5) -> str:
    header = "The following are multiple choice questions (with answers).\n\n"
    shots = "".join(format_example(r) for r in dev_rows[:k_shot])
    return header + shots + format_example(test_row, include_answer=False)


def read_subject(data_dir: str, subject: str):
    def rd(split):
        p = os.path.join(data_dir, split, f"{subject}_{split}.csv")
        with open(p) as f:
            return [row for row in csv.reader(f) if row]

    return rd("dev"), rd("test")


def list_subjects(data_dir: str) -> list[str]:
    test_dir = os.path.join(data_dir, "test")
    return sorted(
        f[: -len("_test.csv")] for f in os.listdir(test_dir) if f.endswith("_test.csv")
    )


def mmlu_eval(
    logits_fn: Callable[[np.ndarray], np.ndarray],  # tokens [1, T] -> logits [1, T, V]
    encode: Callable[[str], list[int]],
    answer_token_ids: tuple[int, int, int, int],
    data_dir: str,
    subjects: Optional[Iterable[str]] = None,
    k_shot: int = 5,
    max_questions_per_subject: Optional[int] = None,
    max_seq_len: int = 2048,
) -> dict:
    """Returns {"accuracy": float, "per_subject": {...}, "n": int}."""
    subjects = list(subjects) if subjects else list_subjects(data_dir)
    per_subject = {}
    total, correct = 0, 0
    ans_ids = np.asarray(answer_token_ids)
    for subject in subjects:
        dev_rows, test_rows = read_subject(data_dir, subject)
        if max_questions_per_subject:
            test_rows = test_rows[:max_questions_per_subject]
        sc, sn = 0, 0
        for row in test_rows:
            k = k_shot
            toks = encode(build_prompt(dev_rows, row, k))
            while len(toks) > max_seq_len and k > 0:
                k -= 1
                toks = encode(build_prompt(dev_rows, row, k))
            tokens = np.asarray(toks, np.int32)[None, :]
            logits = np.asarray(logits_fn(tokens))[0, -1]
            pred = int(np.argmax(logits[ans_ids]))
            gold = CHOICES.index(row[5].strip())
            sc += int(pred == gold)
            sn += 1
        per_subject[subject] = sc / max(sn, 1)
        total += sn
        correct += sc
    return {
        "accuracy": correct / max(total, 1),
        "per_subject": per_subject,
        "n": total,
    }

"""MMLU harness tests with a synthetic dataset + oracle model."""

import csv
import os

import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.utils import mmlu


@pytest.fixture()
def data_dir(tmp_path):
    for split, n in (("dev", 5), ("test", 8)):
        d = tmp_path / split
        d.mkdir()
        with open(d / f"algebra_{split}.csv", "w", newline="") as f:
            w = csv.writer(f)
            for i in range(n):
                w.writerow([f"Q{i}?", "optA", "optB", "optC", "optD",
                            mmlu.CHOICES[i % 4]])
    return str(tmp_path)


def _encode(text):
    # toy char-level tokenizer
    return [ord(c) % 97 for c in text[-256:]]


def test_oracle_scores_100(data_dir):
    """A model that always puts mass on the gold answer token scores 1.0."""
    dev, test = mmlu.read_subject(data_dir, "algebra")
    golds = {}
    for i, row in enumerate(test):
        toks = tuple(_encode(mmlu.build_prompt(dev, row, 5)))
        golds[toks] = mmlu.CHOICES.index(row[5])
    ans_ids = (10, 11, 12, 13)

    def logits_fn(tokens):
        v = np.zeros((1, tokens.shape[1], 50))
        gold = golds[tuple(tokens[0].tolist())]
        v[0, -1, ans_ids[gold]] = 10.0
        return v

    res = mmlu.mmlu_eval(logits_fn, _encode, ans_ids, data_dir)
    assert res["accuracy"] == 1.0
    assert res["n"] == 8


def test_random_scores_quarterish(data_dir):
    rng = np.random.default_rng(0)

    def logits_fn(tokens):
        return rng.normal(size=(1, tokens.shape[1], 50))

    res = mmlu.mmlu_eval(logits_fn, _encode, (10, 11, 12, 13), data_dir)
    assert 0.0 <= res["accuracy"] <= 1.0


def test_subject_listing(data_dir):
    assert mmlu.list_subjects(data_dir) == ["algebra"]

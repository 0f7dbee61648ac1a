"""Calibration / evaluation data utilities.

Functional counterpart of the reference's smart batching
(/root/reference/auto_gptq/utils/data_utils.py:13-260): length-sorted block
packing under a token budget, left padding, -100 label masking, and a simple
batch iterator (no torch DataLoader needed — batches are NumPy dicts).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Sequence

import numpy as np


def make_data_block(
    samples: dict[str, list],
    prompt_col_name: str,
    label_col_name: str,
    tokenizer,
    preprocess_fn: Callable | None = None,
    sample_max_len: int = 1024,
    block_max_len: int = 2048,
    add_eos_token: bool = False,
    truncate_prompt: bool = True,
    merge_prompt_label: bool = False,
) -> dict[str, list]:
    """Tokenize prompt/label pairs and pack them into token-budgeted blocks.

    Mirrors reference semantics: samples are length-sorted, greedily packed so
    that ``padded_len * block_rows <= block_max_len``, left-padded, labels
    -100-masked over prompt/pad positions.
    """
    if preprocess_fn:
        samples = preprocess_fn(samples)

    prompts = samples[prompt_col_name]
    labels = samples[label_col_name]

    prompt_ids = tokenizer(prompts, truncation=False)["input_ids"]
    label_ids = tokenizer(labels, truncation=False)["input_ids"]

    pairs = []
    for p, l in zip(prompt_ids, label_ids):
        if add_eos_token:
            l = l + [tokenizer.eos_token_id]
        # reference semantics (data_utils.py:56-71): the COMBINED
        # prompt+label length is budgeted against sample_max_len;
        # truncate_prompt cuts the prompt from the left, otherwise the label
        # is cut from the right, and samples whose label becomes empty are
        # dropped entirely.
        exceed = len(p) + len(l) - sample_max_len
        if exceed > 0:
            if truncate_prompt:
                p = p[exceed:]
            else:
                l = l[:-exceed]
        if not l:
            continue
        if merge_prompt_label:
            tokens = p + list(l)
            lab = [-100] * len(p) + list(l)
        else:
            tokens = p
            lab = list(l)
        pairs.append((tokens, lab))

    # length-sorted greedy packing
    pairs.sort(key=lambda x: len(x[0]))
    blocks: list[list] = [[]]
    for pair in pairs:
        cur = blocks[-1]
        max_len = max([len(pair[0])] + [len(t) for t, _ in cur])
        if cur and max_len * (len(cur) + 1) > block_max_len:
            blocks.append([pair])
        else:
            cur.append(pair)

    pad_id = tokenizer.pad_token_id
    if pad_id is None:
        pad_id = tokenizer.eos_token_id or 0

    out = {"input_ids": [], "attention_mask": [], "labels": []}
    for block in blocks:
        if not block:
            continue
        width = max(len(t) for t, _ in block)
        lab_width = max(len(l) for _, l in block)
        ids = np.full((len(block), width), pad_id, np.int64)
        mask = np.zeros((len(block), width), np.int64)
        labs = np.full((len(block), lab_width), -100, np.int64)
        for i, (t, l) in enumerate(block):
            ids[i, width - len(t):] = t           # left padding
            mask[i, width - len(t):] = 1
            labs[i, lab_width - len(l):] = l
        out["input_ids"].append(ids)
        out["attention_mask"].append(mask)
        out["labels"].append(labs)
    return out


def collate_data(blocks: list[dict[str, np.ndarray]], pad_token_id: int) -> dict:
    """Pad a list of blocks to a common width and stack (reference
    data_utils.collate_data:141-168)."""
    input_ids = [np.asarray(b["input_ids"]) for b in blocks]
    masks = [np.asarray(b["attention_mask"]) for b in blocks]
    labels = [np.asarray(b["labels"]) for b in blocks if "labels" in b]

    width = max(x.shape[-1] for x in input_ids)

    def pad_left(x, fill):
        pad = width - x.shape[-1]
        if pad == 0:
            return x
        return np.concatenate(
            [np.full((*x.shape[:-1], pad), fill, x.dtype), x], axis=-1
        )

    out = {
        "input_ids": np.concatenate([pad_left(x, pad_token_id) for x in input_ids]),
        "attention_mask": np.concatenate([pad_left(m, 0) for m in masks]),
    }
    if labels:
        lw = max(x.shape[-1] for x in labels)
        out["labels"] = np.concatenate(
            [
                np.concatenate(
                    [np.full((*x.shape[:-1], lw - x.shape[-1]), -100, x.dtype), x],
                    axis=-1,
                )
                for x in labels
            ]
        )
    return out


def get_dataloader(
    data: dict[str, list],
    batch_size: int = 1,
    shuffle: bool = False,
    seed: int = 0,
    pad_token_id: int = 0,
) -> Iterator[dict[str, np.ndarray]]:
    """Iterate packed blocks (output of make_data_block) in batches.

    ``pad_token_id`` must match the id make_data_block padded with (the
    tokenizer's pad/eos id) so cross-block and in-block padding agree."""
    n = len(data["input_ids"])
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, n, batch_size):
        idx = order[i : i + batch_size]
        blocks = [
            {k: data[k][j] for k in ("input_ids", "attention_mask", "labels") if k in data}
            for j in idx
        ]
        yield collate_data(blocks, pad_token_id=pad_token_id)


def random_calibration_examples(
    vocab_size: int, n: int = 128, seqlen: int = 512, seed: int = 0
) -> list[dict]:
    """Synthetic calibration set (for tests / air-gapped smoke runs)."""
    rng = np.random.default_rng(seed)
    return [
        {"input_ids": rng.integers(0, vocab_size, size=(seqlen,)).astype(np.int32)}
        for _ in range(n)
    ]


__all__ = [
    "make_data_block",
    "collate_data",
    "get_dataloader",
    "random_calibration_examples",
]

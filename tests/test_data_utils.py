"""Smart-batching data utilities vs reference semantics
(/root/reference/auto_gptq/utils/data_utils.py:13-168)."""

import numpy as np
import pytest

from autogptq_tpu.utils.data import collate_data, get_dataloader, make_data_block


class FakeTokenizer:
    """Whitespace tokenizer: token id = int(word)."""

    pad_token_id = 7
    eos_token_id = 2

    def __call__(self, texts, truncation=False, **kw):
        if isinstance(texts, str):
            texts = [texts]
        return {"input_ids": [[int(w) for w in t.split()] for t in texts]}


def _samples(prompt_lens, label_lens):
    return {
        "prompt": [" ".join(["5"] * n) for n in prompt_lens],
        "label": [" ".join(["9"] * n) for n in label_lens],
    }


def test_combined_budget_truncates_prompt():
    """prompt+label over sample_max_len cuts the PROMPT from the left."""
    tok = FakeTokenizer()
    out = make_data_block(
        _samples([10], [4]), "prompt", "label", tok,
        sample_max_len=8, block_max_len=64, merge_prompt_label=True,
        truncate_prompt=True,
    )
    ids = out["input_ids"][0]
    assert ids.shape[1] == 8  # 4 prompt kept + 4 label
    labs = out["labels"][0][0]
    assert (labs != -100).sum() == 4


def test_truncate_prompt_false_cuts_label_and_drops_empty():
    """truncate_prompt=False truncates the LABEL from the right; samples
    whose label becomes empty are dropped (reference data_utils.py:60-73)."""
    tok = FakeTokenizer()
    out = make_data_block(
        _samples([6, 10], [4, 2]), "prompt", "label", tok,
        sample_max_len=8, block_max_len=64, merge_prompt_label=False,
        truncate_prompt=False,
    )
    all_lab_lens = sorted(
        int((row != -100).sum()) for blk in out["labels"] for row in blk
    )
    # sample 1: 6+4-8=2 over -> label cut to 2; sample 2: 10+2-8=4 over ->
    # label empty -> dropped entirely
    assert all_lab_lens == [2]
    total_rows = sum(blk.shape[0] for blk in out["input_ids"])
    assert total_rows == 1


def test_dataloader_pad_matches_block_pad():
    """Cross-block padding uses the same pad id as in-block padding."""
    tok = FakeTokenizer()
    out = make_data_block(
        _samples([3, 12], [1, 1]), "prompt", "label", tok,
        sample_max_len=32, block_max_len=12, merge_prompt_label=True,
    )
    assert len(out["input_ids"]) >= 2  # forced into separate blocks
    batches = list(
        get_dataloader(out, batch_size=8, pad_token_id=tok.pad_token_id)
    )
    ids = batches[0]["input_ids"]
    mask = batches[0]["attention_mask"]
    assert set(np.unique(ids[mask == 0])) <= {tok.pad_token_id}


def test_collate_left_pads():
    blocks = [
        {"input_ids": np.array([[1, 2]]), "attention_mask": np.array([[1, 1]])},
        {"input_ids": np.array([[3, 4, 5]]), "attention_mask": np.array([[1, 1, 1]])},
    ]
    out = collate_data(blocks, pad_token_id=7)
    np.testing.assert_array_equal(out["input_ids"][0], [7, 1, 2])
    np.testing.assert_array_equal(out["attention_mask"][0], [0, 1, 1])


@pytest.mark.parametrize(
    "cfg_extra,expect_window",
    [
        ({}, None),                                            # default: off
        ({"use_sliding_window": False}, None),
        ({"use_sliding_window": True, "max_window_layers": 28}, None),
        ({"use_sliding_window": True, "max_window_layers": 0}, 4096),
    ],
)
def test_qwen2_sliding_window_gating(cfg_extra, expect_window):
    """Qwen2 applies its config sliding_window only when use_sliding_window
    is set (HF gating); mistral-style unconditional windowing is wrong."""
    from autogptq_tpu.models.registry import get_family

    c = dict(
        model_type="qwen2", vocab_size=128, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, sliding_window=4096, **cfg_extra,
    )
    cfg = get_family("qwen2").arch_fn(c)
    assert cfg.sliding_window == expect_window


def test_qwen2_mixed_window_layers_rejected():
    """0 < max_window_layers < num_hidden_layers means per-layer mixed
    full/windowed attention, which is not modeled — must fail loudly."""
    from autogptq_tpu.models.registry import get_family

    c = dict(
        model_type="qwen2", vocab_size=128, hidden_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, sliding_window=4096,
        use_sliding_window=True, max_window_layers=2,
    )
    with pytest.raises(NotImplementedError, match="max_window_layers"):
        get_family("qwen2").arch_fn(c)

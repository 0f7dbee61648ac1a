"""Resumable quantization: interrupt after layer 0, resume, and verify the
result is bit-identical to an uninterrupted run (net-new capability — the
reference's quantize() is one monolithic pass, SURVEY §5)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
transformers = pytest.importorskip("transformers")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from autogptq_tpu import AutoGPTQForCausalLM, BaseQuantizeConfig  # noqa: E402


def _fp_model(path):
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=2, num_key_value_heads=2,
        tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(path, safe_serialization=True)


def _examples(rng, n=3):
    return [{"input_ids": rng.integers(0, 128, size=(20,))} for _ in range(n)]


def test_quantize_resume_bit_identical(tmp_path, rng):
    _fp_model(tmp_path / "fp")
    qc = dict(bits=4, group_size=16, desc_act=True)

    # uninterrupted reference run
    m_ref = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    ex = _examples(np.random.default_rng(7))
    m_ref.quantize(ex)

    # checkpointed run
    ckpt = str(tmp_path / "ckpt")
    m1 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    m1.quantize(_examples(np.random.default_rng(7)), checkpoint_dir=ckpt)

    # simulate an interruption after layer 0: truncate the checkpoint
    os.remove(os.path.join(ckpt, "layer_1.safetensors"))
    os.remove(os.path.join(ckpt, "layer_2.safetensors"))
    with open(os.path.join(ckpt, "state.json")) as f:
        state = json.load(f)
    state["next_layer"] = 1
    with open(os.path.join(ckpt, "state.json"), "w") as f:
        json.dump(state, f)

    # resume on a FRESH model
    m2 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    m2.quantize(_examples(np.random.default_rng(7)), checkpoint_dir=ckpt)

    for key, pk_ref in m_ref.packed_layers.items():
        pk = m2.packed_layers[key]
        np.testing.assert_array_equal(np.asarray(pk.qweight), np.asarray(pk_ref.qweight), err_msg=key)
        np.testing.assert_array_equal(np.asarray(pk.qzeros), np.asarray(pk_ref.qzeros), err_msg=key)
        np.testing.assert_array_equal(
            np.asarray(pk.scales).view(np.uint16), np.asarray(pk_ref.scales).view(np.uint16), err_msg=key)

    # config mismatch is rejected
    m3 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"),
        quantize_config=BaseQuantizeConfig(bits=4, group_size=32, desc_act=True),
        dtype=jnp.float32)
    with pytest.raises(ValueError, match="group_size"):
        m3.quantize(_examples(np.random.default_rng(7)), checkpoint_dir=ckpt)


def test_resume_rejects_num_layers_mismatch(tmp_path, rng):
    """A checkpoint produced for a different-depth model must be rejected
    instead of silently grafting its layers onto the wrong architecture."""
    _fp_model(tmp_path / "fp")
    qc = dict(bits=4, group_size=16, desc_act=False)
    ckpt = str(tmp_path / "ckpt")
    m1 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    m1.quantize(_examples(np.random.default_rng(3)), checkpoint_dir=ckpt)

    with open(os.path.join(ckpt, "state.json")) as f:
        state = json.load(f)
    state["num_layers"] = 99
    with open(os.path.join(ckpt, "state.json"), "w") as f:
        json.dump(state, f)

    m2 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    with pytest.raises(ValueError, match="99-layer"):
        m2.quantize(_examples(np.random.default_rng(3)), checkpoint_dir=ckpt)


def test_legacy_state_without_loss_counts_no_double_count(tmp_path, rng):
    """Old checkpoints (no loss_counts) with a truncated layer file must not
    double-count: restored losses are dropped, and the reported average
    covers only the re-quantized layers."""
    _fp_model(tmp_path / "fp")
    qc = dict(bits=4, group_size=16, desc_act=False)
    ckpt = str(tmp_path / "ckpt")
    m1 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    m1.quantize(_examples(np.random.default_rng(3)), checkpoint_dir=ckpt)

    os.remove(os.path.join(ckpt, "layer_1.safetensors"))
    with open(os.path.join(ckpt, "state.json")) as f:
        state = json.load(f)
    state.pop("loss_counts", None)  # simulate a pre-loss_counts checkpoint
    with open(os.path.join(ckpt, "state.json"), "w") as f:
        json.dump(state, f)

    m2 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    first, losses = m2._restore_quant_checkpoint(ckpt, BaseQuantizeConfig(**qc))
    assert first == 1
    assert losses == []  # dropped, not the full (double-countable) list
    # full (non-truncated) legacy restore still keeps all losses
    m2.quantize(_examples(np.random.default_rng(3)), checkpoint_dir=ckpt)
    with open(os.path.join(ckpt, "state.json")) as f:
        state = json.load(f)
    state.pop("loss_counts", None)
    with open(os.path.join(ckpt, "state.json"), "w") as f:
        json.dump(state, f)
    m3 = AutoGPTQForCausalLM.from_pretrained(
        str(tmp_path / "fp"), quantize_config=BaseQuantizeConfig(**qc), dtype=jnp.float32)
    first, losses = m3._restore_quant_checkpoint(ckpt, BaseQuantizeConfig(**qc))
    assert first == state["next_layer"]
    assert len(losses) == len(state["avg_losses"])


def test_quantize_resume_truncated_gap(tmp_path, rng):
    """A missing middle layer file resumes from the gap, not the marker."""
    _fp_model(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False)
    ckpt = str(tmp_path / "ckpt")
    m1 = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    m1.quantize(_examples(np.random.default_rng(3)), checkpoint_dir=ckpt)
    os.remove(os.path.join(ckpt, "layer_1.safetensors"))

    m2 = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    m2.quantize(_examples(np.random.default_rng(3)), checkpoint_dir=ckpt)
    assert set(m2.packed_layers) == set(m1.packed_layers)
    ids = np.random.default_rng(0).integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(m2.forward(ids)), np.asarray(m1.forward(ids)), rtol=2e-3, atol=2e-3)


def test_lm_head_quantization(tmp_path, rng):
    """Opt-in lm_head quantization (GPTQModel-style extension): save names
    include lm_head.qweight; reload matches pre-save forward."""
    _fp_model(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=4, group_size=16, desc_act=False, lm_head=True)
    m = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    m.quantize(_examples(np.random.default_rng(1)))
    from autogptq_tpu.ops.quantlinear import QuantLinear

    assert isinstance(m.params["lm_head"], QuantLinear)
    m.save_quantized(str(tmp_path / "q"))

    from safetensors import safe_open

    ckpt = next((tmp_path / "q").glob("gptq_model-*.safetensors"))
    with safe_open(ckpt, framework="np") as f:
        names = set(f.keys())
    assert "lm_head.qweight" in names and "lm_head.weight" not in names

    m2 = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    assert m2.quantize_config.lm_head is True
    assert isinstance(m2.params["lm_head"], QuantLinear)
    ids = np.random.default_rng(0).integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(m2.forward(ids)), np.asarray(m.forward(ids)), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bits", [2, 3, 8])
def test_quantize_roundtrip_all_bit_widths(bits, tmp_path, rng):
    """Full quantize->save->reload->forward pipeline for the non-4-bit
    widths (4-bit is covered everywhere else): 3-bit exercises the
    nibble-padded kpair runtime layout, 2-bit the kquad layout, 8-bit the
    planar layout (koct measured slower on v5e and stays opt-in)."""
    _fp_model(tmp_path / "fp")
    qc = BaseQuantizeConfig(bits=bits, group_size=16, desc_act=(bits == 3))
    m = AutoGPTQForCausalLM.from_pretrained(str(tmp_path / "fp"), quantize_config=qc, dtype=jnp.float32)
    m.quantize(_examples(np.random.default_rng(bits)))
    m.save_quantized(str(tmp_path / "q"))
    m2 = AutoGPTQForCausalLM.from_quantized(str(tmp_path / "q"), dtype=jnp.float32)
    from autogptq_tpu.ops.quantlinear import QuantLinear

    lin = m2.params["layers"][0]["attn"]["q_proj"]
    assert isinstance(lin, QuantLinear)
    assert lin.layout == {3: "kpair", 2: "kquad", 8: "planar"}[bits]
    ids = np.random.default_rng(0).integers(0, 128, size=(1, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(m2.forward(ids)), np.asarray(m.forward(ids)), rtol=2e-3, atol=2e-3)
    out = m2.generate(ids, max_new_tokens=4)
    assert out.shape == (1, 12)

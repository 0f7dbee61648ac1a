"""LoRA-on-quantized tests: adapter training reduces loss (the reference's
test_peft_conversion.py criterion: 30 optimizer steps, loss decreases and
stays finite)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from autogptq_tpu.models import arch  # noqa: E402
from autogptq_tpu.utils import peft  # noqa: E402


def _quantized_model():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry2", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._tiny_quantized_llama(hidden=128, inter=256, layers=2, group_size=32)


def test_find_all_linear_names():
    params, cfg = _quantized_model()
    names = peft.find_all_linear_names(params)
    assert "attn.q_proj" in names and "mlp.down_proj" in names


def test_inject_and_forward_identity():
    """Fresh adapters (B=0) must not change the forward."""
    params, cfg = _quantized_model()
    tokens = jnp.asarray(np.arange(8)[None], jnp.int32)
    base_logits, _ = arch.forward(params, tokens, cfg, backend="xla", dtype=jnp.float32)

    pcfg = peft.GPTQLoraConfig(r=4, target_modules=("attn.q_proj", "attn.v_proj"))
    lparams = peft.inject_lora(params, pcfg)
    lora_logits, _ = arch.forward(lparams, tokens, cfg, backend="xla", dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(lora_logits), np.asarray(base_logits), rtol=1e-5, atol=1e-5
    )


def test_lora_training_reduces_loss(rng):
    params, cfg = _quantized_model()
    pcfg = peft.GPTQLoraConfig(r=8, lora_alpha=16, target_modules=("attn.q_proj", "attn.v_proj"))
    lparams = peft.inject_lora(params, pcfg)
    trainable, _ = peft.split_lora_params(lparams)

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)

    def loss_fn(trainable, tokens):
        p = peft.merge_lora_params(lparams, trainable)
        logits, _ = arch.forward(p, tokens, cfg, backend="xla", dtype=jnp.float32)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1)[..., 0]
        return jnp.mean(nll)

    opt = optax.adam(1e-2)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, loss

    losses = []
    for _ in range(30):
        trainable, opt_state, loss = step(trainable, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"


def test_adapter_save(tmp_path):
    from autogptq_tpu.models.registry import get_family

    params, cfg = _quantized_model()
    pcfg = peft.GPTQLoraConfig(r=4, target_modules=("attn.q_proj",))
    lparams = peft.inject_lora(params, pcfg)

    class Shim:
        pass

    m = Shim()
    m.params = lparams
    m.spec = get_family("llama")
    peft.save_adapter(m, str(tmp_path))
    from safetensors import safe_open

    with safe_open(tmp_path / "adapter_model.safetensors", framework="np") as f:
        names = list(f.keys())
    assert any("lora_A" in n for n in names)
    assert any(n.startswith("base_model.model.model.layers.0.self_attn.q_proj") for n in names)


def test_adalora_training_and_prune(rng):
    params, cfg = _quantized_model()
    pcfg = peft.GPTQLoraConfig(
        r=8, lora_alpha=16, target_modules=("attn.q_proj",), adalora=True
    )
    lparams = peft.inject_adalora(params, pcfg)

    # identity at init (E = 0)
    tokens = jnp.asarray(np.arange(8)[None], jnp.int32)
    base_logits, _ = arch.forward(params, tokens, cfg, backend="xla", dtype=jnp.float32)
    ada_logits, _ = arch.forward(lparams, tokens, cfg, backend="xla", dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ada_logits), np.asarray(base_logits), rtol=1e-5, atol=1e-5)

    trainable, _ = peft.split_lora_params(lparams)
    assert "lora_e" in trainable["layers"][0]["attn"]["q_proj"]

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)

    def loss_fn(trainable):
        p = peft.merge_lora_params(lparams, trainable)
        logits, _ = arch.forward(p, tokens, cfg, backend="xla", dtype=jnp.float32)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1))

    import optax
    opt = optax.adam(1e-2)
    state = opt.init(trainable)
    @jax.jit
    def step(tr, st):
        loss, g = jax.value_and_grad(loss_fn)(tr)
        up, st = opt.update(g, st)
        return optax.apply_updates(tr, up), st, loss
    losses = []
    for _ in range(20):
        trainable, state, loss = step(trainable, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # prune to rank 4: mask keeps exactly 4 ranks
    merged = peft.merge_lora_params(lparams, trainable)
    node = merged["layers"][0]["attn"]["q_proj"]
    pruned = peft.adalora_prune(node, 4)
    assert int(np.asarray(pruned.rank_mask).sum()) == 4


def test_adaption_prompt_identity_and_training(rng):
    """Zero-init gate => exact identity; 30 steps reduce loss (the
    reference criterion applied to the adaption-prompt PEFT mode)."""
    params, cfg = _quantized_model()
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    base_logits, _ = arch.forward(params, tokens, cfg, backend="xla", dtype=jnp.float32)

    pcfg = peft.AdaptionPromptConfig(adapter_len=4, adapter_layers=2)
    lparams = peft.inject_adaption_prompt(params, pcfg)
    ad_logits, _ = arch.forward(lparams, tokens, cfg, backend="xla", dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ad_logits), np.asarray(base_logits), rtol=1e-5, atol=1e-5
    )

    trainable, _ = peft.split_lora_params(lparams)
    assert any("adaption" in str(b) or (b and "attn" in b) for b in trainable["layers"])

    import optax

    def loss_fn(trainable, tokens):
        p = peft.merge_lora_params(lparams, trainable)
        logits, _ = arch.forward(p, tokens, cfg, backend="xla", dtype=jnp.float32)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1)[..., 0]
        return jnp.mean(nll)

    opt = optax.adam(1e-2)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, loss

    losses = []
    for _ in range(30):
        trainable, opt_state, loss = step(trainable, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_inject_adalora_does_not_mutate_original():
    """inject_adalora must structurally copy blocks: the caller's original
    params tree keeps its QuantLinear nodes."""
    params, cfg = _quantized_model()
    orig_node = params["layers"][0]["attn"]["q_proj"]
    pcfg = peft.GPTQLoraConfig(r=4, target_modules=("attn.q_proj",), adalora=True)
    lparams = peft.inject_adalora(params, pcfg)
    assert isinstance(lparams["layers"][0]["attn"]["q_proj"], peft.AdaLoraLinear)
    assert params["layers"][0]["attn"]["q_proj"] is orig_node  # untouched


def test_inject_adalora_idempotent():
    """Re-injection (or AdaLoRA after LoRA) skips already-wrapped nodes."""
    params, cfg = _quantized_model()
    pcfg = peft.GPTQLoraConfig(r=4, target_modules=("attn.q_proj",), adalora=True)
    p1 = peft.inject_adalora(params, pcfg)
    p2 = peft.inject_adalora(p1, pcfg)  # must not raise
    node = p2["layers"][0]["attn"]["q_proj"]
    assert isinstance(node, peft.AdaLoraLinear)
    assert not isinstance(node.base, peft.AdaLoraLinear)  # no double wrap


def test_adalora_adapter_save(tmp_path):
    """save_adapter writes AdaLoRA weights (A/B/E, mask folded into E)
    instead of silently emitting an empty file."""
    from autogptq_tpu.models.registry import get_family

    params, cfg = _quantized_model()
    pcfg = peft.GPTQLoraConfig(r=4, target_modules=("attn.q_proj",), adalora=True)

    class Shim:
        pass

    m = Shim()
    m.params = peft.inject_adalora(params, pcfg)
    m.spec = get_family("llama")
    peft.save_adapter(m, str(tmp_path / "ada"))
    from safetensors import safe_open

    with safe_open(tmp_path / "ada" / "adapter_model.safetensors", framework="np") as f:
        names = list(f.keys())
        e = f.get_tensor(
            "base_model.model.model.layers.0.self_attn.q_proj.lora_E.weight"
        )
    assert any("lora_A" in n for n in names)
    assert any("lora_B" in n for n in names)
    assert e.shape == (4, 1)

    # a model with no LoRA/AdaLoRA adapters raises instead of writing an
    # empty adapter file
    m2 = Shim()
    m2.params = params
    m2.spec = get_family("llama")
    with pytest.raises(ValueError, match="no LoRA/AdaLoRA"):
        peft.save_adapter(m2, str(tmp_path / "none"))

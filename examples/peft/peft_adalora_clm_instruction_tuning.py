"""Train an AdaLoRA adapter (SVD-form, importance-based rank pruning) on a
quantized base (reference analog:
examples/peft/peft_adalora_clm_instruction_tuning.py).

    python examples/peft/peft_adalora_clm_instruction_tuning.py \
        --quantized_model_dir M --data data.json --out adapters/
"""

import argparse

import jax
import jax.numpy as jnp
import optax
from transformers import AutoTokenizer

from autogptq_tpu import AutoGPTQForCausalLM
from autogptq_tpu.models import arch
from autogptq_tpu.utils import peft
from autogptq_tpu.utils.data import get_dataloader

from peft_lora_clm_instruction_tuning import load_blocks


def _prune_tree(params, target_r):
    """Apply importance-based rank pruning to every AdaLoRA node."""
    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, peft.AdaLoraLinear):
            return peft.adalora_prune(node, target_r)
        return node
    return walk(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--init_r", type=int, default=12)
    ap.add_argument("--target_r", type=int, default=4)
    ap.add_argument("--prune_every", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--block_max_len", type=int, default=512)
    args = ap.parse_args()

    tokenizer = AutoTokenizer.from_pretrained(args.quantized_model_dir)
    model = AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir, backend="xla")

    pcfg = peft.GPTQLoraConfig(
        r=args.init_r, lora_alpha=2 * args.init_r,
        target_modules=("attn.q_proj", "attn.v_proj"),
    )
    lparams = peft.inject_adalora(model.params, pcfg)
    trainable, _ = peft.split_lora_params(lparams)

    data = load_blocks(args.data, tokenizer, args.block_max_len)
    cfg = model.cfg
    opt = optax.adamw(args.lr)
    opt_state = opt.init(trainable)

    def loss_fn(trainable, tokens, mask, labels):
        p = peft.merge_lora_params(lparams, trainable)
        logits, _ = arch.forward(p, tokens, cfg, attn_mask=mask, backend="xla")
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = jnp.maximum(labels[:, 1:], 0)
        nll = -jnp.take_along_axis(lp, tgt[:, :, None], axis=-1)[..., 0]
        m = (labels[:, 1:] != -100).astype(jnp.float32)
        return (nll * m).sum() / jnp.maximum(m.sum(), 1)

    @jax.jit
    def step(trainable, opt_state, tokens, mask, labels):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, tokens, mask, labels)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    for i, batch in enumerate(get_dataloader(data, batch_size=args.batch_size, shuffle=True)):
        trainable, opt_state, loss = step(
            trainable, opt_state,
            jnp.asarray(batch["input_ids"], jnp.int32),
            jnp.asarray(batch["attention_mask"], jnp.int32),
            jnp.asarray(batch["labels"], jnp.int32),
        )
        if (i + 1) % args.prune_every == 0:
            lparams = _prune_tree(peft.merge_lora_params(lparams, trainable), args.target_r)
            trainable, _ = peft.split_lora_params(lparams)
            opt_state = opt.init(trainable)
        print(f"step {i}: loss {float(loss):.4f}", flush=True)

    model.params = peft.merge_lora_params(lparams, trainable)
    peft.save_adapter(model, args.out)
    print(f"adapter saved to {args.out}")


if __name__ == "__main__":
    main()

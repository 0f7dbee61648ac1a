"""Train a LoRA adapter on a quantized base (reference analog:
examples/peft/peft_lora_clm_instruction_tuning.py).

Data: a JSON list of {"instruction": ..., "output": ...} rows (air-gapped
stand-in for the alpaca dataset).

    python examples/peft/peft_lora_clm_instruction_tuning.py \
        --quantized_model_dir M --data data.json --out adapters/
"""

import argparse
import json

import jax
import jax.numpy as jnp
import optax
from transformers import AutoTokenizer

from autogptq_tpu import AutoGPTQForCausalLM
from autogptq_tpu.models import arch
from autogptq_tpu.utils import peft
from autogptq_tpu.utils.data import get_dataloader, make_data_block

TEMPLATE = "### Instruction:\n{instruction}\n\n### Response:\n"


def load_blocks(path: str, tokenizer, block_max_len: int):
    with open(path) as f:
        rows = json.load(f)
    samples = {
        "prompt": [TEMPLATE.format(instruction=r["instruction"]) for r in rows],
        "label": [r["output"] for r in rows],
    }
    return make_data_block(
        samples, "prompt", "label", tokenizer,
        block_max_len=block_max_len, merge_prompt_label=True, add_eos_token=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--block_max_len", type=int, default=512)
    args = ap.parse_args()

    tokenizer = AutoTokenizer.from_pretrained(args.quantized_model_dir)
    # The XLA fallback path is differentiable, so adapters train against the
    # quantized base directly (the reference requires the triton backend for
    # this; _base.py:1263-1265).
    model = AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir, backend="xla")

    pcfg = peft.GPTQLoraConfig(
        r=args.rank, lora_alpha=2 * args.rank, lora_dropout=0.0,
        target_modules=("attn.q_proj", "attn.v_proj"),
    )
    lparams = peft.inject_lora(model.params, pcfg)
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

    for epoch in range(args.epochs):
        for i, batch in enumerate(get_dataloader(data, batch_size=args.batch_size, shuffle=True)):
            trainable, opt_state, loss = step(
                trainable, opt_state,
                jnp.asarray(batch["input_ids"], jnp.int32),
                jnp.asarray(batch["attention_mask"], jnp.int32),
                jnp.asarray(batch["labels"], jnp.int32),
            )
            print(f"epoch {epoch} step {i}: loss {float(loss):.4f}", flush=True)

    model.params = peft.merge_lora_params(lparams, trainable)
    peft.save_adapter(model, args.out)
    print(f"adapter saved to {args.out}")


if __name__ == "__main__":
    main()

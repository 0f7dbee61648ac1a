"""Train LLaMA-Adapter adaption prompts on a quantized base (reference
analog: examples/peft/peft_adaption_prompt_clm_instruction_tuning.py).

    python examples/peft/peft_adaption_prompt_clm_instruction_tuning.py \
        --quantized_model_dir M --data data.json --out adapters/
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from transformers import AutoTokenizer

from autogptq_tpu import AutoGPTQForCausalLM
from autogptq_tpu.models import arch
from autogptq_tpu.utils import peft
from autogptq_tpu.utils.data import get_dataloader

from peft_lora_clm_instruction_tuning import load_blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized_model_dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--adapter_len", type=int, default=10)
    ap.add_argument("--adapter_layers", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--block_max_len", type=int, default=512)
    args = ap.parse_args()

    tokenizer = AutoTokenizer.from_pretrained(args.quantized_model_dir)
    model = AutoGPTQForCausalLM.from_quantized(args.quantized_model_dir, backend="xla")

    pcfg = peft.AdaptionPromptConfig(
        adapter_len=args.adapter_len, adapter_layers=args.adapter_layers
    )
    lparams = peft.inject_adaption_prompt(model.params, pcfg)
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
        print(f"step {i}: loss {float(loss):.4f}", flush=True)

    # save prompts/gates
    tensors = {}
    merged = peft.merge_lora_params(lparams, trainable)
    for li, block in enumerate(merged["layers"]):
        ad = block.get("attn", {}).get("adaption")
        if ad is not None:
            tensors[f"layers.{li}.adaption.prompt"] = np.asarray(ad.prompt)
            tensors[f"layers.{li}.adaption.gate"] = np.asarray(ad.gate)
    from autogptq_tpu.utils import hf_io

    os.makedirs(args.out, exist_ok=True)
    hf_io.save_safetensors(tensors, os.path.join(args.out, "adaption_prompts.safetensors"))
    print(f"adapter saved to {args.out}")


if __name__ == "__main__":
    main()

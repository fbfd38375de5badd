"""LoRA finetuning CLI — TPU analog of the reference's finetune entry point
(``finetune_paligemma_lora`` module, recovered from bytecode — SURVEY.md §2.9
and §3.4).

Same flags and defaults as the reference's fire-exposed ``train``:
model_path, parquet_file, images_folder, output_dir='paligemma_lora',
epochs=1, batch_size=1, lr=1e-4, max_length=256, only_cpu=False,
image_size=224, device=None, accum_steps=16, save_every_n_steps=50,
max_memory_gb=4.5 (accepted, advisory on TPU), max_samples=150.

Flow (reference §3.4): validate dataset -> load model -> LoRA wrap ->
dataset/loader -> AdamW + accumulation + clipping -> periodic robust
checkpoints. ``--demo`` runs on a tiny random model with the byte tokenizer
for environments without a checkpoint.
"""
from __future__ import annotations

import argparse
import sys


def str2bool(v) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--parquet_file", type=str, required=True)
    p.add_argument("--images_folder", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="paligemma_lora")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max_length", type=int, default=256)
    p.add_argument("--only_cpu", type=str2bool, default=False)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--accum_steps", type=int, default=16)
    p.add_argument("--save_every_n_steps", type=int, default=50)
    p.add_argument("--max_memory_gb", type=float, default=4.5)
    p.add_argument("--max_samples", type=int, default=150)
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--lora_dropout", type=float, default=0.1)
    p.add_argument("--demo", action="store_true",
                   help="tiny random model + byte tokenizer (no checkpoint)")
    p.add_argument("--eval_only", action="store_true",
                   help="no training: report mean CE loss + perplexity over "
                        "the dataset (with --adapter_dir, through the saved "
                        "adapter) — closes the train -> eval loop the "
                        "reference leaves open")
    p.add_argument("--adapter_dir", type=str, default=None,
                   help="eval: saved adapter directory to apply (unmerged)")
    args = p.parse_args(argv)

    import jax

    if args.only_cpu:
        jax.config.update("jax_platforms", "cpu")
    print("Device in use: ", jax.devices()[0])

    import jax.numpy as jnp

    from paligemma_tpu import lora as lora_lib
    from paligemma_tpu.data import FinancialImageDataset, validate_dataset
    from paligemma_tpu.lora import LoraConfig

    print("Validating dataset")
    validate_dataset(args.parquet_file, args.images_folder, max_check=100)

    print("Loading model")
    if args.demo or not args.model_path:
        from paligemma_tpu.config import tiny_config
        from paligemma_tpu.models import paligemma
        from paligemma_tpu.processing import ByteTokenizer, PaliGemmaProcessor

        tokenizer = ByteTokenizer()
        cfg = tiny_config()
        proc = PaliGemmaProcessor(
            tokenizer, cfg.vision_config.num_image_tokens,
            cfg.vision_config.image_size,
        )
        from paligemma_tpu.processing import align_config

        cfg = align_config(cfg, proc)  # image id + BOTH vocab sizes
        params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        image_size = cfg.vision_config.image_size
        num_image_tokens = cfg.vision_config.num_image_tokens
    else:
        from paligemma_tpu.processing import PaliGemmaProcessor
        from paligemma_tpu.utils.checkpoint import load_model
        from transformers import AutoTokenizer

        params, cfg = load_model(args.model_path, dtype=jnp.bfloat16)
        tokenizer = AutoTokenizer.from_pretrained(
            args.model_path, padding_side="right"
        )
        # The processor registers <image>/<loc>/<seg> tokens and disables the
        # tokenizer's auto-BOS (reference: processing_paligemma.py:63-75).
        # Without this, a leading BOS shifts the fixed image-token prefix and
        # every training step runs on misaligned inputs.
        PaliGemmaProcessor(
            tokenizer, cfg.vision_config.num_image_tokens,
            cfg.vision_config.image_size,
        )
        image_size = args.image_size
        num_image_tokens = cfg.vision_config.num_image_tokens

    dataset = FinancialImageDataset(
        args.parquet_file,
        args.images_folder,
        tokenizer,
        num_image_tokens=num_image_tokens,
        image_size=image_size,
        max_length=args.max_length,
        max_samples=args.max_samples,
        ignore_index=cfg.ignore_index,
    )
    print(f"Dataset: {len(dataset)} samples")

    lcfg = LoraConfig(r=args.lora_r, alpha=args.lora_alpha, dropout=args.lora_dropout)

    if args.eval_only:
        import functools

        import numpy as np

        from paligemma_tpu.models import paligemma as pg

        adapter = None
        if args.adapter_dir:
            import json
            import os

            adapter = lora_lib.load_adapter(args.adapter_dir)
            r = int(adapter["layers"]["q"]["a"].shape[-1])
            alpha = args.lora_alpha
            acfg_path = os.path.join(args.adapter_dir, "adapter_config.json")
            if os.path.exists(acfg_path):
                with open(acfg_path) as f:
                    acfg = json.load(f)
                r = int(acfg.get("r", r))
                alpha = float(acfg.get("lora_alpha", alpha))
            lcfg = LoraConfig(r=r, alpha=alpha, dropout=0.0)

        @functools.partial(jax.jit, static_argnames=())
        def eval_loss(params, adapter, batch):
            return pg.loss_fn(
                params, cfg, batch["input_ids"], batch["pixel_values"],
                batch["labels"], valid_len=batch.get("valid_len"),
                lora=adapter, lora_scale=lcfg.scale, lora_dropout=0.0,
            )

        # Exact token-weighted mean over ALL samples: the tail batch is
        # padded (static shapes = one compiled eval program) with repeated
        # samples whose labels are masked to ignore_index, so they carry
        # zero weight. dataset.batches() drops ragged tails and would both
        # skip samples and NaN on datasets smaller than batch_size.
        n = len(dataset)
        if n == 0:
            print("error: dataset is empty", file=sys.stderr)
            return 2
        bsz = args.batch_size
        total_nll, total_tok, n_batches = 0.0, 0, 0
        for start in range(0, n, bsz):
            take = list(range(start, min(start + bsz, n)))
            samples = [dataset[i] for i in take]
            samples += [samples[0]] * (bsz - len(take))  # pad rows
            batch = {
                k: np.stack([s[k] for s in samples], axis=0)
                for k in samples[0]
            }
            if len(take) < bsz:
                batch["labels"] = batch["labels"].copy()
                batch["labels"][len(take):] = cfg.ignore_index
            # Per-token weight of this batch = its valid SHIFTED labels
            # (exactly loss_fn's denominator).
            ntok = int((batch["labels"][:, 1:] != cfg.ignore_index).sum())
            if ntok == 0:
                continue
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            total_nll += float(eval_loss(params, adapter, jb)) * ntok
            total_tok += ntok
            n_batches += 1
        if total_tok == 0:
            print("error: no valid label tokens in the dataset", file=sys.stderr)
            return 2
        mean = total_nll / total_tok
        print(
            f"Eval: {n} samples / {n_batches} batches | "
            f"mean loss {mean:.4f} over {total_tok} tokens | "
            f"perplexity {float(np.exp(min(mean, 20.0))):.2f}"
            + (f" | adapter {args.adapter_dir}" if args.adapter_dir else "")
        )
        return 0

    adapter, losses = lora_lib.train(
        params,
        cfg,
        lambda epoch: dataset.batches(
            args.batch_size, shuffle=True, seed=epoch, epochs=1
        ),
        lcfg=lcfg,
        lr=args.lr,
        accum_steps=args.accum_steps,
        epochs=args.epochs,
        save_every_n_steps=args.save_every_n_steps,
        output_dir=args.output_dir,
    )
    if losses:
        print(f"Final loss: {losses[-1]:.4f} over {len(losses)} steps")
    print(f"Adapter saved to {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""CLI inference driver — TPU analog of the reference entry point
(reference: inference.py:87-130).

Same flags and defaults (model_path, prompt, image_file_path,
max_tokens_to_generate=100, temperature=0.8, top_p=0.9, do_sample=False,
only_cpu=False), plus ``--demo`` which runs the full pipeline on a tiny
randomly-initialized model with the built-in byte tokenizer when no
checkpoint is available. ``fire`` is not in this image, so flags are parsed
with argparse (``--flag=value`` and ``--flag value`` both work, as with fire).
"""
from __future__ import annotations

import argparse
import sys


def str2bool(v) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y")


def build_processor(tokenizer, cfg):
    from paligemma_tpu.processing import PaliGemmaProcessor

    return PaliGemmaProcessor(
        tokenizer,
        num_image_tokens=cfg.vision_config.num_image_tokens,
        image_size=cfg.vision_config.image_size,
    )


def test_inference(
    params,
    cfg,
    processor,
    prompt: str,
    image_file_path: str,
    max_tokens_to_generate: int,
    temperature: float,
    top_p: float,
    do_sample: bool,
    cache_dtype=None,
    seed: int = 0,
    speculative: bool = False,
):
    """Greedy/top-p generation loop (reference: inference.py:34-85).

    Returns ``prompt + decoded`` exactly like the reference.
    ``speculative=True`` routes through n-gram speculative decoding —
    greedy output is token-identical, sampled output draws the exact
    plain-sampling distribution; faster when drafts hit.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from paligemma_tpu import generation
    from paligemma_tpu.processing import assert_aligned

    assert_aligned(processor, cfg)  # tokenizer/config contract, fail loudly
    image = Image.open(image_file_path).convert("RGB")
    inputs = processor(text=[prompt], images=[image])
    ids = jnp.asarray(inputs["input_ids"])
    pix = jnp.asarray(inputs["pixel_values"])
    if cache_dtype is None:
        cache_dtype = jax.tree.leaves(params)[0].dtype
        if jnp.issubdtype(cache_dtype, jnp.integer):
            # Quantized params: the first leaf is an int8 q-tensor, which
            # must NOT become the activation/KV dtype (int8 pixels/cache =
            # garbage numerics). Same guard as server.Engine._act_dtype.
            cache_dtype = jnp.bfloat16
    pix = pix.astype(cache_dtype)

    if speculative:
        tokens = generation.generate_spec(
            params, cfg, ids, pix,
            max_new_tokens=max_tokens_to_generate,
            eos_token_id=processor.tokenizer.eos_token_id,
            cache_dtype=cache_dtype,
            do_sample=do_sample, temperature=temperature, top_p=top_p,
            key=jax.random.PRNGKey(seed),
        )
    else:
        tokens = generation.generate_chunked(
            params,
            cfg,
            ids,
            pix,
            max_new_tokens=max_tokens_to_generate,
            eos_token_id=processor.tokenizer.eos_token_id,
            do_sample=do_sample,
            temperature=temperature,
            top_p=top_p,
            key=jax.random.PRNGKey(seed),
            cache_dtype=cache_dtype,
        )
    decoded = processor.tokenizer.decode(tokens, skip_special_tokens=True)
    return prompt + decoded


def load_for_cli(model_path, demo: bool, quant: str = "none"):
    """Load (params, cfg, processor); ``quant="int8"`` converts the decoder
    to the int8 weight-only serving config after load (the bench.py headline
    path — token-identical to bf16 on the measured window, REPORT.md);
    ``quant="w4a8"`` is the mixed int4-weight/int8-activation scheme
    (fused Pallas MLP — fastest measured single-stream decode,
    int4_bench.json)."""
    import jax
    import jax.numpy as jnp

    def maybe_quant(params):
        if quant in ("int8", "w4a8"):
            from paligemma_tpu.quantization import quantize_params

            params = quantize_params(params, llm_only=True, mode=quant)
        elif quant not in (None, "none"):
            raise ValueError(f"unknown quant mode {quant!r}")
        return params

    if demo or not model_path:
        from paligemma_tpu.config import tiny_config
        from paligemma_tpu.models import paligemma
        from paligemma_tpu.processing import ByteTokenizer

        tokenizer = ByteTokenizer()
        cfg = tiny_config()
        processor = build_processor(tokenizer, cfg)
        from paligemma_tpu.processing import align_config

        cfg = align_config(cfg, processor)  # image id + BOTH vocab sizes
        params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        return maybe_quant(params), cfg, processor

    from paligemma_tpu.utils.checkpoint import load_model

    params, cfg = load_model(model_path, dtype=jnp.bfloat16)
    params = maybe_quant(params)
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path, padding_side="right")
    except Exception as e:
        raise RuntimeError(
            f"could not load tokenizer from {model_path}: {e!r}. "
            "Pass --demo to run without a checkpoint."
        )
    return params, cfg, build_processor(tokenizer, cfg)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--image_file_path", type=str, default=None)
    p.add_argument("--max_tokens_to_generate", type=int, default=100)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--do_sample", type=str2bool, default=False)
    p.add_argument("--only_cpu", type=str2bool, default=False)
    p.add_argument("--demo", action="store_true", help="tiny random model + byte tokenizer")
    p.add_argument("--quant", choices=["none", "int8", "w4a8"], default="none",
                   help="int8: weight-only quantized decoder (the serving "
                        "config — ~2x decode throughput, token-identical "
                        "to bf16 on the measured window); w4a8: int4 MLP "
                        "weights + int8 activations in one fused Pallas "
                        "kernel per layer (fastest measured decode, "
                        "int4_bench.json)")
    p.add_argument("--prefill_a8", type=str2bool, default=False,
                   help="both-operands-int8 MXU prefill projections "
                        "(requires --quant int8; opt-in — not "
                        "token-identical to bf16, see REPORT.md)")
    p.add_argument("--speculative", action="store_true",
                   help="n-gram speculative decoding — greedy output is "
                        "token-identical, sampled output draws the exact "
                        "plain-sampling distribution; faster when the "
                        "answer repeats context (document VQA)")
    args = p.parse_args(argv)

    import jax

    if args.only_cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.prefill_a8 and args.quant not in ("int8", "w4a8"):
        print("error: --prefill_a8 requires --quant int8 or w4a8",
              file=sys.stderr)
        return 2
    from paligemma_tpu import runtime

    # CLI wins over the PALIGEMMA_PREFILL_A8 env default, both directions;
    # set before the first jit trace.
    runtime.set_prefill_a8(bool(args.prefill_a8))
    print("Device in use: ", jax.devices()[0])

    print("Loading model")
    params, cfg, processor = load_for_cli(args.model_path, args.demo, args.quant)

    if args.prompt is None or args.image_file_path is None:
        print("error: --prompt and --image_file_path are required", file=sys.stderr)
        return 2

    print("Running inference")
    print(
        test_inference(
            params,
            cfg,
            processor,
            args.prompt,
            args.image_file_path,
            args.max_tokens_to_generate,
            args.temperature,
            args.top_p,
            args.do_sample,
            speculative=args.speculative,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

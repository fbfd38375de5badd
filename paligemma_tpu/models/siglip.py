"""SigLIP ViT vision encoder, functional JAX.

Capability parity with the reference encoder (reference: modeling_siglip.py):
patch embedding (conv with kernel=stride=patch), learned absolute position
embedding, pre-LN transformer blocks with full bidirectional MHA (fp32
softmax) and tanh-GeLU MLP, final post-layernorm. Output:
``(B, num_patches, hidden)`` like SiglipVisionModel.forward
(modeling_siglip.py:246-255).

TPU-first design departures from the torch reference:
- Pure functions over a parameter pytree; no modules, no Python state.
- All encoder layers are stacked along a leading axis and traversed with
  ``lax.scan`` — one compiled layer body instead of 27 unrolled layers.
- The patch conv is lowered to patch-extraction + a single (B*N, C*P*P) x
  (C*P*P, D) matmul so the FLOPs land on the MXU as one large GEMM.
- Matmuls carry ``preferred_element_type=float32`` so bf16 weights accumulate
  in fp32 on the MXU.

Parameter tree (dtype = param dtype, typically bf16 on TPU / fp32 for parity):
  patch_embedding: {kernel: (P*P*C, D), bias: (D,)}
  position_embedding: (N, D)
  layers (stacked, leading axis L):
    ln1: {scale: (L, D), bias: (L, D)}
    attn: {qkv: {kernel: (L, D, 3D), bias: (L, 3D)},  # fused q|k|v
           o:   {kernel: (L, D, D),  bias: (L, D)}}
    ln2: {scale: (L, D), bias: (L, D)}
    mlp: {fc1: {kernel: (L, D, I), bias: (L, I)}, fc2: {kernel: (L, I, D), bias: (L, D)}}
  post_layernorm: {scale: (D,), bias: (D,)}
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from paligemma_tpu.config import SiglipVisionConfig
from paligemma_tpu.ops.attention import mha
from paligemma_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def init_params(
    cfg: SiglipVisionConfig, key: jax.Array, dtype: jnp.dtype = jnp.float32
) -> Params:
    d, i, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    patch_in = cfg.patch_size * cfg.patch_size * cfg.num_channels
    keys = jax.random.split(key, 10)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5).astype(dtype)

    return {
        "patch_embedding": {
            "kernel": dense(keys[0], (patch_in, d), patch_in),
            "bias": jnp.zeros((d,), dtype),
        },
        "position_embedding": dense(keys[1], (cfg.num_patches, d), d),
        "layers": {
            "ln1": {"scale": jnp.ones((l, d), dtype), "bias": jnp.zeros((l, d), dtype)},
            "attn": {
                # q/k/v fused along the output dim (one GEMM per block, same
                # math — mirrors the decoder's qkv fusion; checkpoint.py
                # concatenates the HF per-projection weights on load).
                "qkv": {
                    "kernel": jnp.concatenate(
                        [dense(keys[2 + j], (l, d, d), d) for j in range(3)],
                        axis=2,
                    ),
                    "bias": jnp.zeros((l, 3 * d), dtype),
                },
                "o": {
                    "kernel": dense(keys[5], (l, d, d), d),
                    "bias": jnp.zeros((l, d), dtype),
                },
            },
            "ln2": {"scale": jnp.ones((l, d), dtype), "bias": jnp.zeros((l, d), dtype)},
            "mlp": {
                "fc1": {
                    "kernel": dense(keys[6], (l, d, i), d),
                    "bias": jnp.zeros((l, i), dtype),
                },
                "fc2": {
                    "kernel": dense(keys[7], (l, i, d), i),
                    "bias": jnp.zeros((l, d), dtype),
                },
            },
        },
        "post_layernorm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def extract_patches(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, N, C*P*P) with channel-major flattening.

    Flattening order matches the torch conv weight layout (D, C, P, P) so a
    checkpoint conv kernel reshaped to (C*P*P, D) multiplies these patches
    exactly like nn.Conv2d (reference: modeling_siglip.py:45-51).
    """
    b, c, h, w = pixel_values.shape
    p = patch_size
    hp, wp = h // p, w // p
    x = pixel_values.reshape(b, c, hp, p, wp, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, Hp, Wp, C, P, P)
    return x.reshape(b, hp * wp, c * p * p)


def embed(params: Params, cfg: SiglipVisionConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """Patch + position embedding (reference: modeling_siglip.py:62-79)."""
    patches = extract_patches(pixel_values, cfg.patch_size)
    kernel = params["patch_embedding"]["kernel"]
    x = (
        jnp.einsum("bnp,pd->bnd", patches.astype(kernel.dtype), kernel,
                   preferred_element_type=jnp.float32).astype(kernel.dtype)
        + params["patch_embedding"]["bias"]
    )
    return x + params["position_embedding"][None, :, :]


def _layer(cfg: SiglipVisionConfig, h: jnp.ndarray, lp: Params) -> jnp.ndarray:
    """One pre-LN encoder block (reference: modeling_siglip.py:169-204)."""
    d = cfg.hidden_size
    nh = cfg.num_attention_heads
    hd = cfg.head_dim
    b, n, _ = h.shape

    def proj(x, w):
        from paligemma_tpu.quantization import QTensor, qproj

        if isinstance(w["kernel"], QTensor):
            return qproj(x, w["kernel"]) + w["bias"]
        return (
            jnp.einsum("bnd,de->bne", x, w["kernel"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
            + w["bias"]
        )

    residual = h
    x = layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    qkv = proj(x, lp["attn"]["qkv"])  # one (D, 3D) GEMM instead of three
    q, k, v = (y.reshape(b, n, nh, hd) for y in jnp.split(qkv, 3, axis=-1))
    from paligemma_tpu import runtime

    use_flash = runtime.use_pallas_attention or (
        runtime.auto_flash_min_seq and n >= runtime.auto_flash_min_seq
    )
    if use_flash:
        from paligemma_tpu.ops.pallas_attention import flash_attention

        attn = flash_attention(q, k, v).reshape(b, n, d)
    else:
        attn = mha(q, k, v).reshape(b, n, d)
    h = residual + proj(attn, lp["attn"]["o"])

    residual = h
    x = layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    x = proj(x, lp["mlp"]["fc1"])
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)
    x = proj(x, lp["mlp"]["fc2"])
    return residual + x


def apply(params: Params, cfg: SiglipVisionConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """Full encoder: (B, C, H, W) -> (B, N, D).

    Layer traversal is a ``lax.scan`` over stacked layer params — the TPU
    analog of the reference's Python loop (modeling_siglip.py:219-221) with a
    single compiled block body.
    """
    h = embed(params, cfg, pixel_values)

    def body(carry, lp):
        return _layer(cfg, carry, lp), None

    h, _ = jax.lax.scan(body, h, params["layers"])
    return layer_norm(
        h,
        params["post_layernorm"]["scale"],
        params["post_layernorm"]["bias"],
        cfg.layer_norm_eps,
    )

"""Sharding rules: how the PaliGemma parameter pytree maps onto the mesh.

Megatron-style tensor parallelism expressed as GSPMD sharding annotations:
- attention q / MLP gate+up kernels: column-parallel (output dim on MODEL),
- attention o / MLP down kernels: row-parallel (input dim on MODEL),
- K/V kernels: output dim (kv_heads*head_dim) on MODEL when divisible —
  for Gemma-2B's single KV head this shards head_dim; GSPMD inserts the
  psum for the split contraction,
- token embedding: vocab-parallel (doubles as the tied lm_head shard),
- norms / biases / small tensors: replicated,
- activations & KV cache: batch on DATA, head dims on MODEL.

XLA/GSPMD materializes the collectives (all-reduce after row-parallel
matmuls, all-gather where layouts meet) over ICI; nothing here issues a
communication primitive by hand. The reference has no distributed path at
all (SURVEY.md §2.10) — this is pure TPU-native headroom.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _div(n: int, mesh: Mesh) -> bool:
    return n % mesh.shape[MODEL_AXIS] == 0


def param_shardings(
    cfg: PaliGemmaConfig, mesh: Mesh, params: Any = None
) -> Dict[str, Any]:
    """NamedSharding pytree matching ``paligemma.init_params`` structure.

    Pass ``params`` when the tree holds int8 ``QTensor`` leaves
    (quantization.quantize_params): each kernel's sharding is then expanded to
    ``QTensor(q=<kernel sharding>, scale=<compatible sharding>)`` — the
    per-output-channel scale keeps the kernel's partitioning only on axes it
    can actually divide (its contraction axis is size 1, so row-parallel
    kernels get replicated scales). Without this, jax.device_put's pytree-
    prefix broadcast would try to shard the size-1 scale axis model-ways.
    """
    tc, vc = cfg.text_config, cfg.vision_config
    rep = _ns(mesh)  # replicated
    col = _ns(mesh, None, None, MODEL_AXIS)  # (L, in, out): shard out
    row = _ns(mesh, None, MODEL_AXIS, None)  # (L, in, out): shard in

    kv_out = tc.num_key_value_heads * tc.head_dim

    vision = {
        "patch_embedding": {"kernel": rep, "bias": rep},
        "position_embedding": rep,
        "layers": {
            "ln1": {"scale": rep, "bias": rep},
            "attn": {
                # fused (L, D, 3D): column sharding splits the fused output
                # dim; 3*hidden divisible iff hidden is.
                "qkv": {"kernel": col if _div(vc.hidden_size, mesh) else rep, "bias": rep},
                "o": {"kernel": row if _div(vc.hidden_size, mesh) else rep, "bias": rep},
            },
            "ln2": {"scale": rep, "bias": rep},
            "mlp": {
                "fc1": {
                    "kernel": col if _div(vc.intermediate_size, mesh) else rep,
                    "bias": rep,
                },
                "fc2": {
                    "kernel": row if _div(vc.intermediate_size, mesh) else rep,
                    "bias": rep,
                },
            },
        },
        "post_layernorm": {"scale": rep, "bias": rep},
    }

    q_out = tc.num_attention_heads * tc.head_dim
    # qkv / gate_up are stored fused along the output dim; column sharding
    # splits that fused dim. When a shard straddles a q/k/v (or gate/up)
    # boundary, GSPMD reshards around the post-matmul static slices — correct
    # by construction, and cheap at decode shapes (B, 1, .).
    qkv_out = q_out + 2 * kv_out
    llm = {
        "embed": _ns(mesh, MODEL_AXIS, None) if _div(tc.vocab_size, mesh) else rep,
        "layers": {
            "input_ln": rep,
            "qkv": col if _div(qkv_out, mesh) else rep,
            "o": row if _div(q_out, mesh) else rep,
            "post_ln": rep,
            "gate_up": col if _div(2 * tc.intermediate_size, mesh) else rep,
            "down": row if _div(tc.intermediate_size, mesh) else rep,
        },
        "final_norm": rep,
    }

    tree = {
        "vision": vision,
        "projector": {"kernel": rep, "bias": rep},
        "llm": llm,
    }
    if params is not None:
        # w4a8 trees carry int8 companions for large-row MLP calls
        # (gemma._mlp); they inherit the base kernel's TP layout.
        p_layers = params.get("llm", {}).get("layers", {})
        for name, base in (("gate_up_i8", "gate_up"), ("down_i8", "down")):
            if name in p_layers:
                llm["layers"][name] = llm["layers"][base]
        if "embed_w4" in params.get("llm", {}):
            # Q4A8TiledTensor -> replicated by _expand_qtensor_shardings
            # (same reasoning as the fused-MLP stacks).
            llm["embed_w4"] = llm["embed"]
        tree = _expand_qtensor_shardings(tree, params, mesh)
    return tree


def _expand_qtensor_shardings(shard_tree, params, mesh: Mesh):
    """Expand kernel shardings to QTensor(q, scale) pairs where ``params``
    holds quantized leaves (see param_shardings docstring).

    w4a8 tiled leaves (``Q4A8TiledTensor``) are REPLICATED: their packed
    layout (L, nb_o, nb_d, block_d, half) is consumed by a Mosaic kernel
    that indexes the full stack (ops.pallas_quant.mlp_w4a8_stacked), which
    GSPMD cannot auto-partition — under TP the fused MLP runs replicated
    while qkv/o/embed carry the model-axis sharding. At 4 bits the MLP is
    ~0.9 GB at 3B, so per-chip replication is an acceptable cost until a
    shard_map'd per-device kernel variant exists."""
    from paligemma_tpu.ops.pallas_quant import Q4A8TiledTensor
    from paligemma_tpu.quantization import QTensor

    rep = _ns(mesh)

    def scale_sharding(kernel_ns: NamedSharding, scale_shape) -> NamedSharding:
        spec = list(kernel_ns.spec) + [None] * (
            len(scale_shape) - len(kernel_ns.spec)
        )
        kept = []
        for dim, name in zip(scale_shape, spec):
            size = mesh.shape[name] if name is not None else 1
            kept.append(name if name is not None and dim % size == 0 and dim >= size else None)
        return NamedSharding(mesh, P(*kept))

    def fix(p, s):
        if isinstance(p, QTensor):
            return QTensor(q=s, scale=scale_sharding(s, p.scale.shape))
        if isinstance(p, Q4A8TiledTensor):
            return Q4A8TiledTensor(
                packed=rep, scale=rep,
                scale2=None if p.scale2 is None else rep,
            )
        return s

    return jax.tree.map(
        fix, params, shard_tree,
        is_leaf=lambda x: isinstance(x, (QTensor, Q4A8TiledTensor)),
    )


def lora_shardings(cfg: PaliGemmaConfig, mesh: Mesh) -> Dict[str, Any]:
    """Shardings for the LoRA adapter pytree (paligemma_tpu.lora).

    A-matrices (L, D, r) are replicated (r is tiny); B-matrices (L, r, out)
    follow the column-parallel layout of the base kernel they adapt.
    """
    tc = cfg.text_config
    rep = _ns(mesh)
    col = _ns(mesh, None, None, MODEL_AXIS)
    q_out = tc.num_attention_heads * tc.head_dim
    kv_out = tc.num_key_value_heads * tc.head_dim

    def pair(out_dim):
        return {"a": rep, "b": col if _div(out_dim, mesh) else rep}

    return {
        "layers": {
            "q": pair(q_out),
            "k": pair(kv_out),
            "v": pair(kv_out),
        }
    }


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) DATA sharding for inputs/labels."""
    return _ns(mesh, DATA_AXIS)


def cache_shardings(mesh: Mesh) -> Any:
    """KVCache sharding: batch on DATA; (L, B, S, Hkv, hd) leaves."""
    from paligemma_tpu.models.gemma import KVCache

    kv = _ns(mesh, None, DATA_AXIS, None, None, None)
    return KVCache(k=kv, v=kv, length=_ns(mesh))


def shard_params(params: Dict[str, Any], shardings: Dict[str, Any]) -> Dict[str, Any]:
    return jax.device_put(params, shardings)

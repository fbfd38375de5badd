"""pjit-compiled multi-chip steps: sharded inference and LoRA training.

Each builder returns a jitted function whose inputs/outputs carry explicit
``NamedSharding``s over the (data, model) mesh; GSPMD partitions the whole
program and inserts the ICI collectives. The single-chip code in
``paligemma_tpu.models`` is reused unchanged — sharding is pure annotation,
the TPU-idiomatic scale-out story (SURVEY.md §2.10: the reference has no
distributed path; this is headroom the rebuild adds).
"""
from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.lora import LoraConfig
from paligemma_tpu.models import paligemma
from paligemma_tpu.parallel import sharding as shd
from paligemma_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_sharded_prefill(
    cfg: PaliGemmaConfig, mesh: Mesh, sequence_parallel: bool = False,
    params=None,
):
    """Sharded prefill: params TP-sharded, batch DP-sharded, cache sharded.

    ``sequence_parallel=True`` additionally keeps the decoder's residual
    stream sharded along the sequence axis over the MODEL mesh axis between
    blocks (Megatron-SP layout) — GSPMD inserts the all-gather/reduce-scatter
    pairs around the TP matmuls.

    Pass ``params`` for int8 QTensor trees (sharding.param_shardings).
    """
    pshard = shd.param_shardings(cfg, mesh, params=params)
    batch = NamedSharding(mesh, P(DATA_AXIS))
    cache = shd.cache_shardings(mesh)
    rep = NamedSharding(mesh, P())
    hidden = (
        NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
        if sequence_parallel
        else None
    )

    return jax.jit(
        lambda params, ids, pix, kv: paligemma.prefill(
            params, cfg, ids, pix, kv, hidden_sharding=hidden
        ),
        in_shardings=(pshard, batch, batch, cache),
        out_shardings=(rep, cache),
    )


def make_sharded_decode(cfg: PaliGemmaConfig, mesh: Mesh, params=None):
    pshard = shd.param_shardings(cfg, mesh, params=params)
    batch = NamedSharding(mesh, P(DATA_AXIS))
    cache = shd.cache_shardings(mesh)
    rep = NamedSharding(mesh, P())

    return jax.jit(
        lambda params, tok, kv: paligemma.decode_step(params, cfg, tok, kv),
        in_shardings=(pshard, batch, cache),
        out_shardings=(rep, cache),
    )


def make_sharded_train_step(
    cfg: PaliGemmaConfig,
    lcfg: LoraConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
):
    """The full distributed LoRA training step: DP over batch, TP over the
    model kernels, adapters and optimizer state sharded to match.

    step(params, lora, opt_state, batch, key) -> (loss, lora, opt_state)
    """
    pshard = shd.param_shardings(cfg, mesh)
    lshard = shd.lora_shardings(cfg, mesh)
    batch_s = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    def loss_of_lora(lora, params, batch, key):
        n_layers = cfg.text_config.num_hidden_layers
        keys = jax.random.split(key, n_layers) if lcfg.dropout > 0 else None
        return paligemma.loss_fn(
            params,
            cfg,
            batch["input_ids"],
            batch["pixel_values"],
            batch["labels"],
            valid_len=batch.get("valid_len"),
            lora=lora,
            lora_scale=lcfg.scale,
            lora_dropout=lcfg.dropout,
            lora_keys=keys,
        )

    def step(params, lora, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_of_lora)(lora, params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return loss, lora, opt_state

    batch_shardings = {
        "input_ids": batch_s,
        "pixel_values": batch_s,
        "labels": batch_s,
        "valid_len": batch_s,
    }
    jitted = jax.jit(
        step,
        in_shardings=(pshard, lshard, None, batch_shardings, rep),
        out_shardings=(rep, lshard, None),
    )

    def step_normalized(params, lora, opt_state, batch, key):
        # valid_len is optional in the single-chip API (loss_fn defaults to
        # no padding); fill it here so the jitted in_shardings pytree always
        # matches instead of raising a cryptic structure mismatch.
        if "valid_len" not in batch:
            import jax.numpy as jnp

            t = batch["input_ids"].shape[1]
            batch = dict(batch)
            batch["valid_len"] = jnp.full(
                (batch["input_ids"].shape[0],), t, jnp.int32
            )
        return jitted(params, lora, opt_state, batch, key)

    return step_normalized

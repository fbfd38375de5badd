"""LoRA finetuning of the Gemma decoder attention projections.

Capability parity with the reference finetune module
(``finetune_paligemma_lora``, recovered from bytecode — SURVEY.md §2.9):
- LoRA config: r=8, alpha=16, dropout=0.1, bias none, target modules
  q_proj/k_proj/v_proj of the decoder attention.
- Training: AdamW over adapter params only, shifted CE loss with
  ignore_index, gradient accumulation (accum_steps), global-norm clipping,
  periodic robust checkpointing (3-tier fallback), memory monitoring.

TPU-native design: adapters are a separate pytree (base params frozen —
no requires_grad bookkeeping); the train step is one jitted
``value_and_grad`` over the adapters with optax
(clip_by_global_norm -> adamw, wrapped in optax.MultiSteps for
accumulation); per-layer dropout keys ride the same ``lax.scan`` the decoder
layers do. For inference the adapters merge into the base kernels
(``merge_lora``) so the serving path is unchanged.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.models import paligemma

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    """Mirrors the reference's peft LoraConfig (SURVEY.md §2.9)."""

    r: int = 8
    alpha: int = 16
    dropout: float = 0.1
    target_modules: Tuple[str, ...] = ("q", "k", "v")

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def init_lora(
    cfg: PaliGemmaConfig,
    lcfg: LoraConfig,
    key: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 — so the initial delta is zero,
    matching peft's init."""
    tc = cfg.text_config
    d = tc.hidden_size
    out_dims = {
        "q": tc.num_attention_heads * tc.head_dim,
        "k": tc.num_key_value_heads * tc.head_dim,
        "v": tc.num_key_value_heads * tc.head_dim,
    }
    l = tc.num_hidden_layers
    keys = jax.random.split(key, len(out_dims))
    layers = {}
    for i, name in enumerate(["q", "k", "v"]):
        if name in lcfg.target_modules:
            layers[name] = {
                "a": (
                    jax.random.normal(keys[i], (l, d, lcfg.r), jnp.float32)
                    * (1.0 / lcfg.r)
                ).astype(dtype),
                "b": jnp.zeros((l, lcfg.r, out_dims[name]), dtype),
            }
        else:
            # Zero-rank placeholder keeps the pytree structure static.
            layers[name] = {
                "a": jnp.zeros((l, d, 1), dtype),
                "b": jnp.zeros((l, 1, out_dims[name]), dtype),
            }
    return {"layers": layers}


def merge_lora(params: Params, lora: Params, lcfg: LoraConfig) -> Params:
    """Fold adapters into the base kernels: W' = W + scale * A @ B.

    The base q/k/v projections live in one fused ``qkv`` kernel (concatenated
    along the output dim — models/gemma.py); each adapter's delta is added to
    its slice. Returns a new params pytree usable by every inference path
    unchanged.
    """
    new_layers = dict(params["llm"]["layers"])
    base = new_layers["qkv"]
    if not hasattr(base, "dtype") or isinstance(base, tuple):  # QTensor etc.
        raise TypeError(
            "merge_lora requires unquantized base kernels; merge into the "
            "bf16/fp32 params first, then quantize_params() the result"
        )
    merged = base.astype(jnp.float32)
    offset = 0
    for name in ("q", "k", "v"):
        ad = lora["layers"][name]
        out_dim = ad["b"].shape[-1]
        delta = jnp.einsum("ldr,lre->lde", ad["a"].astype(jnp.float32),
                           ad["b"].astype(jnp.float32)) * lcfg.scale
        merged = merged.at[:, :, offset : offset + out_dim].add(delta)
        offset += out_dim
    assert offset == base.shape[-1], (offset, base.shape)
    new_layers["qkv"] = merged.astype(base.dtype)
    new_llm = dict(params["llm"])
    new_llm["layers"] = new_layers
    out = dict(params)
    out["llm"] = new_llm
    return out


def make_train_step(
    cfg: PaliGemmaConfig,
    lcfg: LoraConfig,
    optimizer: optax.GradientTransformation,
    train: bool = True,
):
    """Build the jitted LoRA train step.

    step(params, lora, opt_state, batch, key) -> (loss, lora, opt_state)
    batch = {"input_ids", "pixel_values", "labels"}; base params frozen.
    """

    def loss_of_lora(lora, params, batch, key):
        n_layers = cfg.text_config.num_hidden_layers
        lora_keys = jax.random.split(key, n_layers) if train and lcfg.dropout > 0 else None
        return paligemma.loss_fn(
            params,
            cfg,
            batch["input_ids"],
            batch["pixel_values"],
            batch["labels"],
            valid_len=batch.get("valid_len"),
            lora=lora,
            lora_scale=lcfg.scale,
            lora_dropout=lcfg.dropout if train else 0.0,
            lora_keys=lora_keys,
        )

    def step(params, lora, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_of_lora)(lora, params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return loss, lora, opt_state

    return jax.jit(step)


def default_optimizer(
    lr: float = 1e-4,
    accum_steps: int = 16,
    max_grad_norm: float = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW, with gradient accumulation
    (reference loop: clip_grad_norm_ + AdamW + accum_steps, SURVEY.md §2.9)."""
    opt = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


# ---------------------------------------------------------------------------
# Robust checkpointing (reference: save_checkpoint_robust, 3-tier fallback)
# ---------------------------------------------------------------------------


def save_checkpoint_robust(
    lora: Params,
    lcfg: LoraConfig,
    output_dir: str,
    step: int,
    extra_info: Optional[dict] = None,
) -> str:
    """Save the adapter with tiered fallbacks + a checkpoint_info.json record.

    Tier 1: safetensors adapter (adapter_model.safetensors + adapter_config).
    Tier 2: numpy .npz adapter.
    Tier 3: pickle of the raw pytree.
    Always writes checkpoint_info.json with step/status (reference §2.9).
    """
    os.makedirs(output_dir, exist_ok=True)
    info = {"step": step, "time": time.time(), "errors": []}
    if extra_info:
        info.update(extra_info)
    saved = None

    flat = {}

    def _flatten(tree, prefix=""):
        for k, v in tree.items():
            kk = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                _flatten(v, kk)
            else:
                flat[kk] = np.asarray(v, np.float32)

    _flatten(lora)

    try:
        from safetensors.numpy import save_file

        save_file(flat, os.path.join(output_dir, "adapter_model.safetensors"))
        with open(os.path.join(output_dir, "adapter_config.json"), "w") as f:
            json.dump(
                {
                    "r": lcfg.r,
                    "lora_alpha": lcfg.alpha,
                    "lora_dropout": lcfg.dropout,
                    "bias": "none",
                    "target_modules": [f"{m}_proj" for m in lcfg.target_modules],
                    "task_type": "CAUSAL_LM",
                },
                f,
                indent=2,
            )
        saved = "safetensors"
    except Exception as e:  # pragma: no cover - fallback path
        info["errors"].append(f"safetensors: {e!r}")
        try:
            np.savez(os.path.join(output_dir, "adapter_model.npz"), **flat)
            saved = "npz"
        except Exception as e2:
            info["errors"].append(f"npz: {e2!r}")
            import pickle

            with open(os.path.join(output_dir, "adapter_model.pkl"), "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, lora), f)
            saved = "pickle"

    info["format"] = saved
    with open(os.path.join(output_dir, "checkpoint_info.json"), "w") as f:
        json.dump(info, f, indent=2)
    return saved


def save_train_state(output_dir: str, step: int, adapter: Params, opt_state) -> None:
    """Full training-state checkpoint (adapter + optimizer state + step) via
    orbax — enables exact resume, which the reference lacks entirely
    (SURVEY.md §5: 'a checkpoint is weights only')."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, "train_state"))
    ckptr = ocp.StandardCheckpointer()
    state = {"adapter": adapter, "opt_state": opt_state, "step": jnp.int32(step)}
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_train_state(output_dir: str, adapter_like: Params, opt_state_like):
    """Restore (adapter, opt_state, step) saved by ``save_train_state``.

    ``*_like`` provide the pytree structure/shapes for orbax restoration.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, "train_state"))
    ckptr = ocp.StandardCheckpointer()
    target = {
        "adapter": adapter_like,
        "opt_state": opt_state_like,
        "step": jnp.int32(0),
    }
    state = ckptr.restore(path, target)
    return state["adapter"], state["opt_state"], int(state["step"])


def load_adapter(output_dir: str, dtype: jnp.dtype = jnp.float32) -> Params:
    """Load an adapter saved by ``save_checkpoint_robust`` (any tier)."""
    st = os.path.join(output_dir, "adapter_model.safetensors")
    npz = os.path.join(output_dir, "adapter_model.npz")
    pkl = os.path.join(output_dir, "adapter_model.pkl")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        flat = load_file(st)
    elif os.path.exists(npz):
        flat = dict(np.load(npz))
    elif os.path.exists(pkl):
        import pickle

        with open(pkl, "rb") as f:
            return jax.tree.map(lambda x: jnp.asarray(x, dtype), pickle.load(f))
    else:
        raise FileNotFoundError(f"no adapter found in {output_dir}")

    tree: Params = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v, dtype)
    return tree


def train(
    params: Params,
    cfg: PaliGemmaConfig,
    batches: Iterable[dict],
    lcfg: Optional[LoraConfig] = None,
    lr: float = 1e-4,
    accum_steps: int = 16,
    epochs: int = 1,
    save_every_n_steps: int = 50,
    output_dir: str = "paligemma_lora",
    seed: int = 0,
    log_every: int = 10,
    logger=print,
    resume: bool = False,
    save_train_state_too: bool = False,
) -> Tuple[Params, list]:
    """LoRA training loop (reference defaults: SURVEY.md §2.9).

    ``batches`` is any iterable of {"input_ids", "pixel_values", "labels"}
    numpy/JAX batches (see paligemma_tpu.data for the parquet dataset), or a
    callable ``epoch -> iterable`` for multi-epoch runs.
    ``resume=True`` restores adapter+optimizer+step from ``output_dir`` (if a
    train_state exists) and skips already-trained steps.
    Returns (trained adapter pytree, per-step losses).
    """
    lcfg = lcfg or LoraConfig()
    lora = init_lora(cfg, lcfg, jax.random.PRNGKey(seed))
    optimizer = default_optimizer(lr=lr, accum_steps=accum_steps)
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(cfg, lcfg, optimizer)
    key = jax.random.PRNGKey(seed + 1)

    losses = []
    step = 0
    start_step = 0
    consecutive_failures = 0
    if resume and os.path.exists(os.path.join(output_dir, "train_state")):
        lora, opt_state, start_step = load_train_state(output_dir, lora, opt_state)
        logger(f"resumed from step {start_step}")
    for epoch in range(epochs):
        # ``batches`` may be a callable (fresh iterator per epoch), a list, or
        # a one-shot generator (single epoch only).
        epoch_batches = batches(epoch) if callable(batches) else batches
        for batch in epoch_batches:
            key, sub = jax.random.split(key)
            if step < start_step:  # resume: replay the schedule without work
                step += 1
                continue
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            try:
                loss, lora, opt_state = step_fn(params, lora, opt_state, batch, sub)
            except Exception as e:  # OOM-recovery analog (reference §2.9)
                consecutive_failures += 1
                logger(f"step {step}: error {e!r}; clearing caches and skipping")
                jax.clear_caches()
                if consecutive_failures >= 3:
                    # Persistent failures (shape/dtype/data bugs) are not
                    # transient OOM — surface them instead of "completing"
                    # a run that trained nothing.
                    raise
                continue
            consecutive_failures = 0
            losses.append(float(loss))
            step += 1
            if log_every and step % log_every == 0:
                logger(f"epoch {epoch} step {step}: loss {losses[-1]:.4f}")
            if save_every_n_steps and step % save_every_n_steps == 0:
                save_checkpoint_robust(lora, lcfg, output_dir, step)
                if save_train_state_too:
                    save_train_state(output_dir, step, lora, opt_state)
    save_checkpoint_robust(lora, lcfg, output_dir, step, {"final": True})
    if save_train_state_too:
        save_train_state(output_dir, step, lora, opt_state)
    return lora, losses

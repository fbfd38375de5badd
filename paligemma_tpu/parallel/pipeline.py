"""Pipeline parallelism: GPipe-style stage pipelining over a ``pipe`` mesh axis.

The decoder's stacked layers (L, ...) are split into P contiguous stages of
L/P layers, one stage per device along the ``pipe`` axis. A microbatched
forward runs as an explicit shard_map program: every tick, each stage applies
its layers to its current microbatch and ``ppermute``s the activations to the
next stage over ICI. Stage s processes microbatch m at tick s + m; the last
stage emits outputs at ticks P-1 .. P-1+M-1; a psum replicates them (all
other stages contribute exact zeros — with no biases, a zero activation stays
zero through RMSNorm/attention/GeGLU, so bubble ticks are self-masking).

Unlike the GSPMD tensor/data shardings in ``parallel/steps.py`` (pure
annotations — the compiler inserts collectives), pipelining is an explicit
schedule: shard_map + ppermute IS the TPU-native way to write one. Gradients
flow through ppermute's transpose (the reverse permute), so ``value_and_grad``
of the pipelined loss is the GPipe backward schedule for free.

The reference has no distributed path at all (SURVEY.md §2.10); together with
DP x TP x SP this completes the dp/tp/sp/pp coverage the multi-chip dry run
validates.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from paligemma_tpu.config import GemmaConfig
from paligemma_tpu.models import gemma
from paligemma_tpu.ops.norms import rms_norm
from paligemma_tpu.ops.rope import rope_cos_sin

PIPE_AXIS = "pipe"


def stage_params(llm_params: Dict[str, Any], n_stages: int) -> Dict[str, Any]:
    """Reshape the stacked (L, ...) layer pytree to (P, L/P, ...) stages."""
    layers = llm_params["layers"]
    l = jax.tree.leaves(layers)[0].shape[0]
    assert l % n_stages == 0, (l, n_stages)
    per = l // n_stages
    return jax.tree.map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), layers
    )


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()[:n_stages]
    return Mesh(np.asarray(devices), (PIPE_AXIS,))


def pipelined_decoder_forward(
    llm_params: Dict[str, Any],
    cfg: GemmaConfig,
    inputs_embeds: jnp.ndarray,  # (B, T, D), B = n_microbatches * mb
    positions: jnp.ndarray,  # (B, T)
    mesh: Mesh,
    n_microbatches: int,
) -> jnp.ndarray:
    """Cache-free decoder forward, pipelined over the mesh's ``pipe`` axis.

    Semantically identical to ``gemma.forward(..., cache=None, mask=None)``
    (full bidirectional prefix-LM attention) — equality-tested on the virtual
    CPU mesh. Returns (B, T, D) hidden states (post final_norm).
    """
    n_stages = mesh.shape[PIPE_AXIS]
    b, t, d = inputs_embeds.shape
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches

    dtype = inputs_embeds.dtype
    h = inputs_embeds * jnp.asarray(cfg.hidden_size**0.5, dtype)
    cos, sin = rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.max_position_embeddings, dtype
    )

    # (M, mb, T, .) microbatch streams, padded with P-1 bubble ticks.
    def to_stream(x):
        x = x.reshape((n_microbatches, mb) + x.shape[1:])
        pad = jnp.zeros((n_stages - 1,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    h_s, cos_s, sin_s = to_stream(h), to_stream(cos), to_stream(sin)
    staged = stage_params(llm_params, n_stages)

    def per_device(stages, h_s, cos_s, sin_s):
        my_layers = jax.tree.map(lambda x: x[0], stages)  # (L/P, ...)
        stage_idx = jax.lax.axis_index(PIPE_AXIS)

        def apply_stage(x, cos, sin):
            def body(carry, lp):
                new_h, _ = gemma._decoder_layer(
                    cfg, lp, carry, cos, sin, None, None, None
                )
                return new_h, None

            out, _ = jax.lax.scan(body, x, my_layers)
            return out

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(state, xt):
            h_st, cos_st, sin_st = state
            x, cos_t, sin_t = xt
            # Stage 0 injects the fresh microbatch; later stages consume the
            # activations permuted in from their predecessor. cos/sin belong
            # to a microbatch, so they ride the pipeline WITH it (stage s
            # processes microbatch t-s at tick t — the tick-t stream values
            # are only correct at stage 0).
            inp = jnp.where(stage_idx == 0, x, h_st)
            cos = jnp.where(stage_idx == 0, cos_t, cos_st)
            sin = jnp.where(stage_idx == 0, sin_t, sin_st)
            y = apply_stage(inp, cos, sin)
            nxt = tuple(
                jax.lax.ppermute(a, PIPE_AXIS, perm) for a in (y, cos, sin)
            )
            out = jnp.where(stage_idx == n_stages - 1, y, jnp.zeros_like(y))
            return nxt, out

        init = (
            jnp.zeros((mb, t, d), h_s.dtype),
            jnp.zeros_like(cos_s[0]),
            jnp.zeros_like(sin_s[0]),
        )
        # Newer JAX tracks varying-manual-axes: the carry becomes
        # pipe-varying after the first ppermute, so the init must be marked
        # varying too.
        if hasattr(jax.lax, "pcast"):
            init = jax.tree.map(
                lambda x: jax.lax.pcast(x, PIPE_AXIS, to="varying"), init
            )
        elif hasattr(jax.lax, "pvary"):
            init = jax.tree.map(lambda x: jax.lax.pvary(x, PIPE_AXIS), init)
        _, outs = jax.lax.scan(tick, init, (h_s, cos_s, sin_s))
        outs = outs[n_stages - 1 :]  # last stage emits mb m at tick P-1+m
        return jax.lax.psum(outs, PIPE_AXIS)  # zeros elsewhere -> replicate

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    outs = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(), P(), P()),
        out_specs=P(),
    )(staged, h_s, cos_s, sin_s)

    hidden = outs.reshape(b, t, d)
    return rms_norm(hidden, llm_params["final_norm"], cfg.rms_norm_eps)


def pipelined_loss_fn(
    params: Dict[str, Any],
    cfg,  # PaliGemmaConfig
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    labels: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
) -> jnp.ndarray:
    """Shifted-CE loss with the decoder trunk pipelined over ``pipe``.

    Vision tower + merge + lm_head run replicated (they are a small fraction
    of the FLOPs); gradients flow through the pipeline schedule via
    ppermute's transpose. Matches ``paligemma.loss_fn`` numerically.
    """
    from paligemma_tpu.models import paligemma

    b, t = input_ids.shape
    image_features = paligemma.encode_image(params, cfg, pixel_values)
    embeds = paligemma.merge_prefix(params, cfg, input_ids, image_features)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    hidden = pipelined_decoder_forward(
        params["llm"], cfg.text_config, embeds, positions, mesh, n_microbatches
    )
    logits = gemma.logits(params["llm"], hidden)

    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != cfg.ignore_index
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return -jnp.sum(jnp.where(valid, tok_lp, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

"""Pipeline parallelism: the GPipe-style shard_map schedule must be
numerically identical to the single-device decoder forward, and its loss
must match paligemma.loss_fn (gradients flow through ppermute's transpose).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.config import tiny_config
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipelined_decoder_forward,
    pipelined_loss_fn,
)


def _cfg_with_layers(n_layers: int):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        text_config=dataclasses.replace(
            cfg.text_config, num_hidden_layers=n_layers
        ),
    )


@pytest.mark.parametrize("n_stages,n_layers,n_micro", [(2, 2, 2), (4, 4, 3)])
def test_pipelined_forward_matches_single_device(n_stages, n_layers, n_micro):
    cfg = _cfg_with_layers(n_layers)
    tc = cfg.text_config
    params = gemma.init_params(tc, jax.random.PRNGKey(0), jnp.float32)
    b, t = n_micro * 2, 5
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, t, tc.hidden_size))
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))

    ref, _ = gemma.forward(params, tc, embeds, positions, cache=None, mask=None)
    mesh = make_pipe_mesh(n_stages)
    out = pipelined_decoder_forward(params, tc, embeds, positions, mesh, n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipelined_loss_matches_and_differentiates():
    cfg = _cfg_with_layers(2)
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    b = 4
    n_img = cfg.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((b, n_img), cfg.image_token_index, jnp.int32),
         jax.random.randint(jax.random.PRNGKey(1), (b, 4), 2, 250)], axis=1,
    )
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (b, 3, size, size))
    labels = ids

    ref = paligemma.loss_fn(params, cfg, ids, pix, labels)
    mesh = make_pipe_mesh(2)
    out = pipelined_loss_fn(params, cfg, ids, pix, labels, mesh, n_microbatches=2)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5, atol=1e-5)

    # Gradients flow through the pipeline (GPipe backward = ppermute
    # transpose); check one decoder-kernel grad against the plain loss grad.
    def f_pp(p):
        return pipelined_loss_fn(p, cfg, ids, pix, labels, mesh, n_microbatches=2)

    def f_ref(p):
        return paligemma.loss_fn(p, cfg, ids, pix, labels)

    g_pp = jax.grad(f_pp)(params)["llm"]["layers"]["qkv"]
    g_ref = jax.grad(f_ref)(params)["llm"]["layers"]["qkv"]
    np.testing.assert_allclose(
        np.asarray(g_pp), np.asarray(g_ref), rtol=2e-4, atol=2e-5
    )

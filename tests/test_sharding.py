"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Correctness invariant: GSPMD-sharded execution must produce the same numbers
as single-device execution (up to reduction-order noise) for prefill, decode,
and the full LoRA train step, across mesh shapes (pure DP, pure TP, 2x4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu import generation
from paligemma_tpu.lora import LoraConfig, default_optimizer, init_lora
from paligemma_tpu.models import paligemma
from paligemma_tpu.parallel import sharding as shd
from paligemma_tpu.parallel import steps
from paligemma_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def batch_inputs(cfg):
    n_img = cfg.vision_config.num_image_tokens
    b, t_text = 8, 6
    ids_text = jax.random.randint(jax.random.PRNGKey(1), (b, t_text), 2, 250)
    ids = jnp.concatenate(
        [jnp.full((b, n_img), cfg.image_token_index, jnp.int32), ids_text], axis=1
    )
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (b, 3, size, size))
    return ids, pix


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,model", [(8, 1), (1, 8), (2, 4)])
def test_sharded_prefill_matches_single(cfg, params, batch_inputs, data, model):
    ids, pix = batch_inputs
    cache = generation.make_cache(cfg, ids.shape[0], ids.shape[1], 4, jnp.float32)
    ref_logits, ref_cache = paligemma.prefill(params, cfg, ids, pix, cache)

    mesh = make_mesh(data=data, model=model)
    pshard = shd.param_shardings(cfg, mesh)
    sparams = jax.device_put(params, pshard)
    scache = jax.device_put(cache, shd.cache_shardings(mesh))
    prefill = steps.make_sharded_prefill(cfg, mesh)
    logits, new_cache = prefill(sparams, ids, pix, scache)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_cache.k), np.asarray(ref_cache.k), rtol=2e-4, atol=2e-4
    )


def test_sharded_decode_matches_single(cfg, params, batch_inputs):
    ids, pix = batch_inputs
    cache = generation.make_cache(cfg, ids.shape[0], ids.shape[1], 4, jnp.float32)
    logits, cache1 = paligemma.prefill(params, cfg, ids, pix, cache)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    ref, _ = paligemma.decode_step(params, cfg, tok, cache1)

    mesh = make_mesh(data=2, model=4)
    sparams = jax.device_put(params, shd.param_shardings(cfg, mesh))
    scache = jax.device_put(cache1, shd.cache_shardings(mesh))
    decode = steps.make_sharded_decode(cfg, mesh)
    out, _ = decode(sparams, tok, scache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sharded_train_step_runs_and_matches(cfg, params, batch_inputs):
    ids, pix = batch_inputs
    labels = ids
    batch = {
        "input_ids": ids,
        "pixel_values": pix,
        "labels": labels,
        "valid_len": jnp.full((ids.shape[0],), ids.shape[1], jnp.int32),
    }
    lcfg = LoraConfig(r=2, alpha=4, dropout=0.0)
    opt = default_optimizer(lr=1e-2, accum_steps=1)

    adapter = init_lora(cfg, lcfg, jax.random.PRNGKey(3))
    opt_state = opt.init(adapter)

    # single-device reference
    from paligemma_tpu.lora import make_train_step

    ref_step = make_train_step(cfg, lcfg, opt)
    ref_loss, ref_adapter, _ = ref_step(
        params, adapter, opt_state, batch, jax.random.PRNGKey(0)
    )

    mesh = make_mesh(data=2, model=4)
    sparams = jax.device_put(params, shd.param_shardings(cfg, mesh))
    sadapter = jax.device_put(adapter, shd.lora_shardings(cfg, mesh))
    sstep = steps.make_sharded_train_step(cfg, lcfg, opt, mesh)
    opt_state2 = opt.init(sadapter)
    loss, new_adapter, _ = sstep(
        sparams, sadapter, opt_state2, batch, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_adapter), jax.tree.leaves(new_adapter)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_sequence_parallel_prefill_matches_single(cfg, params, batch_inputs):
    """Megatron-SP residual-stream sharding must not change the numbers."""
    ids, pix = batch_inputs
    cache = generation.make_cache(cfg, ids.shape[0], ids.shape[1], 4, jnp.float32)
    ref_logits, _ = paligemma.prefill(params, cfg, ids, pix, cache)

    mesh = make_mesh(data=2, model=4)
    sparams = jax.device_put(params, shd.param_shardings(cfg, mesh))
    scache = jax.device_put(cache, shd.cache_shardings(mesh))
    prefill_sp = steps.make_sharded_prefill(cfg, mesh, sequence_parallel=True)
    logits, _ = prefill_sp(sparams, ids, pix, scache)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_sharded_prefill_a8_matches_single(cfg, params, batch_inputs):
    """a8 prefill (both-operands-int8 projections, runtime.prefill_a8) under
    tensor parallelism: GSPMD-sharded execution must reproduce the
    single-device a8 numbers — the int8 einsum partitions on the weight's
    output dim with the per-token activation scales replicated, so the
    int32 accumulation never crosses devices."""
    from paligemma_tpu import runtime
    from paligemma_tpu.quantization import quantize_params

    ids, pix = batch_inputs
    qp = quantize_params(params, llm_only=True)
    cache = generation.make_cache(cfg, ids.shape[0], ids.shape[1], 4, jnp.float32)

    jax.clear_caches()  # flag is trace-time state (runtime.py contract)
    runtime.set_prefill_a8(True)
    old_min = runtime.a8_min_seq
    runtime.a8_min_seq = 8  # tiny prompt is 22 tokens
    try:
        ref_logits, _ = paligemma.prefill(qp, cfg, ids, pix, cache)

        mesh = make_mesh(data=2, model=4)
        sqp = jax.device_put(qp, shd.param_shardings(cfg, mesh, params=qp))
        scache = jax.device_put(cache, shd.cache_shardings(mesh))
        prefill = steps.make_sharded_prefill(cfg, mesh, params=qp)
        logits, _ = prefill(sqp, ids, pix, scache)
    finally:
        runtime.set_prefill_a8(False)
        runtime.a8_min_seq = old_min
        jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_sharded_prefill_int8_weightonly_matches_single(cfg, params, batch_inputs):
    """int8 weight-only params (QTensor leaves) under TP: the expanded
    QTensor shardings (param_shardings(params=...)) reproduce single-device
    quantized prefill."""
    from paligemma_tpu.quantization import quantize_params

    ids, pix = batch_inputs
    qp = quantize_params(params, llm_only=True)
    cache = generation.make_cache(cfg, ids.shape[0], ids.shape[1], 4, jnp.float32)
    ref_logits, _ = paligemma.prefill(qp, cfg, ids, pix, cache)

    mesh = make_mesh(data=2, model=4)
    sqp = jax.device_put(qp, shd.param_shardings(cfg, mesh, params=qp))
    scache = jax.device_put(cache, shd.cache_shardings(mesh))
    prefill = steps.make_sharded_prefill(cfg, mesh, params=qp)
    logits, _ = prefill(sqp, ids, pix, scache)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )

"""LoRA adapter tests: zero-init identity, merge equivalence, training descent,
robust checkpoint round-trip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paligemma_tpu import lora as lora_lib
from paligemma_tpu.lora import LoraConfig
from paligemma_tpu.models import paligemma


@pytest.fixture(scope="module")
def lcfg():
    return LoraConfig(r=4, alpha=8, dropout=0.0)


def test_zero_init_is_identity(params, cfg, sample_inputs, lcfg):
    """B=0 at init -> adapted forward == base forward exactly."""
    ids, pix = sample_inputs
    adapter = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(3))
    base = paligemma.forward_nocache(params, cfg, ids, pix)
    adapted = paligemma.forward_nocache(
        params, cfg, ids, pix, lora=adapter, lora_scale=lcfg.scale
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(adapted))


def test_merge_matches_unmerged_forward(params, cfg, sample_inputs, lcfg):
    """W + scale*A@B merged == adapters applied on the fly."""
    ids, pix = sample_inputs
    key = jax.random.PRNGKey(4)
    adapter = lora_lib.init_lora(cfg, lcfg, key)
    # randomize B so the delta is nonzero
    adapter = jax.tree.map(
        lambda x: jax.random.normal(key, x.shape, x.dtype) * 0.02, adapter
    )
    on_the_fly = paligemma.forward_nocache(
        params, cfg, ids, pix, lora=adapter, lora_scale=lcfg.scale
    )
    merged = lora_lib.merge_lora(params, adapter, lcfg)
    merged_out = paligemma.forward_nocache(merged, cfg, ids, pix)
    np.testing.assert_allclose(
        np.asarray(on_the_fly), np.asarray(merged_out), rtol=2e-4, atol=2e-4
    )


def test_training_reduces_loss(params, cfg, sample_inputs, lcfg):
    """A few AdamW steps on one batch must reduce the CE loss, and must not
    touch the base params (adapter-only training)."""
    ids, pix = sample_inputs
    labels = ids.at[:, : cfg.vision_config.num_image_tokens].set(cfg.ignore_index)
    batch = {"input_ids": ids, "pixel_values": pix, "labels": labels}

    adapter = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(5))
    opt = lora_lib.default_optimizer(lr=5e-2, accum_steps=1)
    opt_state = opt.init(adapter)
    step = lora_lib.make_train_step(cfg, lcfg, opt, train=True)

    losses = []
    key = jax.random.PRNGKey(6)
    for i in range(5):
        key, sub = jax.random.split(key)
        loss, adapter, opt_state = step(params, adapter, opt_state, batch, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_accumulation_updates_every_k(params, cfg, sample_inputs, lcfg):
    ids, pix = sample_inputs
    labels = ids
    batch = {"input_ids": ids, "pixel_values": pix, "labels": labels}
    adapter = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(5))
    opt = lora_lib.default_optimizer(lr=1e-2, accum_steps=2)
    opt_state = opt.init(adapter)
    step = lora_lib.make_train_step(cfg, lcfg, opt, train=True)
    _, adapter1, opt_state = step(params, adapter, opt_state, batch, jax.random.PRNGKey(0))
    # After 1 of 2 accumulation micro-steps, params unchanged.
    chex_equal = jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), adapter, adapter1
    )
    assert all(jax.tree.leaves(chex_equal))
    _, adapter2, opt_state = step(params, adapter1, opt_state, batch, jax.random.PRNGKey(1))
    changed = jax.tree.map(lambda a, b: bool(jnp.any(a != b)), adapter, adapter2)
    assert any(jax.tree.leaves(changed))


def test_checkpoint_roundtrip(tmp_path, cfg, lcfg):
    adapter = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(7))
    fmt = lora_lib.save_checkpoint_robust(adapter, lcfg, str(tmp_path), step=3)
    assert fmt == "safetensors"
    assert (tmp_path / "adapter_config.json").exists()
    assert (tmp_path / "checkpoint_info.json").exists()
    loaded = lora_lib.load_adapter(str(tmp_path))
    for a, b in zip(jax.tree.leaves(adapter), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_train_driver_smoke(tmp_path, params, cfg, sample_inputs):
    """End-to-end train() driver over a tiny iterable of batches."""
    ids, pix = sample_inputs
    labels = ids
    batches = [
        {"input_ids": ids, "pixel_values": pix, "labels": labels} for _ in range(3)
    ]
    adapter, losses = lora_lib.train(
        params, cfg, batches,
        lcfg=LoraConfig(r=2, alpha=4, dropout=0.1),
        lr=1e-3, accum_steps=1, epochs=1,
        save_every_n_steps=2, output_dir=str(tmp_path), log_every=0,
    )
    assert len(losses) == 3
    assert (tmp_path / "adapter_model.safetensors").exists()


def test_train_state_resume(tmp_path, params, cfg, sample_inputs):
    """Full train-state checkpoint: train 4 steps saving state, then resume
    from step 2's state and verify the final adapter matches a straight run."""
    ids, pix = sample_inputs
    batch = {"input_ids": ids, "pixel_values": pix, "labels": ids}
    batches = [batch] * 4
    lcfg = LoraConfig(r=2, alpha=4, dropout=0.0)

    out_a = str(tmp_path / "a")
    adapter_full, losses_full = lora_lib.train(
        params, cfg, batches, lcfg=lcfg, lr=1e-2, accum_steps=1,
        save_every_n_steps=2, output_dir=out_a, log_every=0,
        save_train_state_too=True,
    )
    assert (tmp_path / "a" / "train_state").exists()

    # Re-run but only the first 2 steps, saving state.
    out_b = str(tmp_path / "b")
    lora_lib.train(
        params, cfg, batches[:2], lcfg=lcfg, lr=1e-2, accum_steps=1,
        save_every_n_steps=2, output_dir=out_b, log_every=0,
        save_train_state_too=True,
    )
    # Resume in out_b and complete steps 3-4.
    adapter_resumed, losses_resumed = lora_lib.train(
        params, cfg, batches, lcfg=lcfg, lr=1e-2, accum_steps=1,
        save_every_n_steps=0, output_dir=out_b, log_every=0,
        resume=True,
    )
    assert len(losses_resumed) == 2  # only steps 3-4 executed
    for a, b in zip(jax.tree.leaves(adapter_full), jax.tree.leaves(adapter_resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

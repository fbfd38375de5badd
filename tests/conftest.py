"""Test harness config: force the CPU backend with 8 virtual devices.

The axon sitecustomize force-registers the remote TPU backend regardless of
JAX_PLATFORMS, so we override via jax.config before any backend initializes.
Sharding tests use the 8-device virtual CPU mesh.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from paligemma_tpu.config import tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def params(cfg):
    return paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)


@pytest.fixture(scope="session")
def sample_inputs(cfg):
    n_img = cfg.vision_config.num_image_tokens
    b, t_text = 1, 6
    ids_text = jax.random.randint(jax.random.PRNGKey(1), (b, t_text), 2, 250)
    ids = jnp.concatenate(
        [jnp.full((b, n_img), cfg.image_token_index, jnp.int32), ids_text], axis=1
    )
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (b, 3, size, size))
    return ids, pix

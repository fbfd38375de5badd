"""TPU-native PaliGemma vision-language framework (JAX/XLA/Pallas).

A from-scratch rebuild of the reference PaliGemma-3B stack
(PhilipWilliamVentura/multimodal-financial-analysis-tool-using-paligemma)
designed TPU-first: functional models over parameter pytrees, lax.scan layer
traversal and decode loops, a preallocated HBM KV cache, Pallas fused kernels
for the hot ops, and pjit/shard_map sharding for multi-chip scale-out.
"""

from paligemma_tpu.config import (
    GemmaConfig,
    PaliGemmaConfig,
    SiglipVisionConfig,
    paligemma_3b_pt_224,
    paligemma_3b_pt_448,
    paligemma_3b_pt_896,
    tiny_config,
)
from paligemma_tpu.models.gemma import KVCache
from paligemma_tpu.runtime import enable_compilation_cache

# Remote compiles on the tunneled TPU backend cost minutes; persist them
# across processes for every entry point. No-op if the user already
# configured jax_compilation_cache_dir.
enable_compilation_cache()

__version__ = "0.1.0"

__all__ = [
    "GemmaConfig",
    "PaliGemmaConfig",
    "SiglipVisionConfig",
    "paligemma_3b_pt_224",
    "paligemma_3b_pt_448",
    "paligemma_3b_pt_896",
    "tiny_config",
    "KVCache",
    # submodules (imported lazily by users):
    # generation, serving, quantization, lora, data, processing, runtime,
    # models, ops, parallel, utils, native
]

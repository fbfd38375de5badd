"""TPU compute ops: attention, norms, RoPE, sampling (XLA + Pallas paths)."""

from paligemma_tpu.ops.norms import rms_norm, layer_norm
from paligemma_tpu.ops.rope import rope_cos_sin, apply_rope
from paligemma_tpu.ops.attention import mha, gqa_attention, MASK_VALUE
from paligemma_tpu.ops.sampling import sample_top_p, greedy

__all__ = [
    "rms_norm",
    "layer_norm",
    "rope_cos_sin",
    "apply_rope",
    "mha",
    "gqa_attention",
    "MASK_VALUE",
    "sample_top_p",
    "greedy",
]

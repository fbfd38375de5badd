"""Model families: SigLIP vision encoder, Gemma decoder, PaliGemma fusion."""

from paligemma_tpu.models import siglip, gemma, paligemma

__all__ = ["siglip", "gemma", "paligemma"]

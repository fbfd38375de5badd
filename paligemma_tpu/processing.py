"""PaliGemma processor: image preprocessing + prompt templating + tokenization.

API-compatible with the reference ``PaliGemmaProcessor``
(reference: processing_paligemma.py:52-117): registers the ``<image>``
special token plus 1024 ``<locXXXX>`` and 128 ``<segXXX>`` extra tokens,
disables tokenizer auto-BOS/EOS, templates prompts as
``"<image>" * N + BOS + prompt + "\\n"`` and returns
``{"pixel_values", "input_ids", "attention_mask"}`` — as numpy/JAX arrays
instead of torch tensors.

Image preprocessing (resize bicubic -> x/255 -> (x-0.5)/0.5 -> CHW,
reference: processing_paligemma.py:13-50) is provided in two forms:
- ``process_images``: host-side PIL/numpy path, bit-matching the reference
  (PIL bicubic resampling).
- ``preprocess_jit``: a jit-compiled on-device path using
  ``jax.image.resize(method="bicubic")`` for batched TPU pipelines (resize
  kernels differ from PIL by design; use the host path when exact parity
  with the reference matters).

Because this environment has no HF tokenizer assets, ``PaliGemmaProcessor``
accepts any object implementing the small tokenizer protocol used here
(an HF ``AutoTokenizer`` satisfies it); ``ByteTokenizer`` is a dependency-free
stand-in for tests and offline demos.
"""
from __future__ import annotations

import functools
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # PIL is available in this image; gate anyway for minimal installs.
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGENET_STANDARD_MEAN = [0.5, 0.5, 0.5]
IMAGENET_STANDARD_STD = [0.5, 0.5, 0.5]
IMAGE_TOKEN = "<image>"


def add_image_tokens_to_prompt(
    prefix_prompt: str, bos_token: str, image_seq_len: int, image_token: str
) -> str:
    """Prompt template (reference: processing_paligemma.py:10-11)."""
    return f"{image_token * image_seq_len}{bos_token}{prefix_prompt}\n"


def resize(image, size: Tuple[int, int], resample=None):
    """PIL resize to (height, width) (reference: processing_paligemma.py:13-18)."""
    height, width = size
    return image.resize((width, height), resample=resample)


def rescale(image: np.ndarray, scale: float, dtype=np.float32) -> np.ndarray:
    return (image * scale).astype(dtype)


def normalize(
    image: np.ndarray, mean: Iterable[float], std: Iterable[float]
) -> np.ndarray:
    mean = np.array(mean, dtype=image.dtype)
    std = np.array(std, dtype=image.dtype)
    return (image - mean) / std


def process_images(
    images: Sequence,
    size: Tuple[int, int],
    resample=None,
    rescale_factor: float = 1 / 255.0,
    image_mean=IMAGENET_STANDARD_MEAN,
    image_std=IMAGENET_STANDARD_STD,
) -> List[np.ndarray]:
    """Host preprocessing pipeline (reference: processing_paligemma.py:31-50).

    resize -> np.array -> x*1/255 -> (x-mean)/std -> HWC->CHW, per image.
    """
    if resample is None and Image is not None:
        resample = Image.Resampling.BICUBIC
    out = []
    for image in images:
        img = resize(image, size=size, resample=resample)
        arr = np.array(img)
        arr = rescale(arr, scale=rescale_factor)
        arr = normalize(arr, mean=image_mean, std=image_std)
        out.append(arr.transpose(2, 0, 1))
    return out


def process_images_uint8(
    images: Sequence, size: Tuple[int, int], resample=None
) -> List[np.ndarray]:
    """Resize-only half of the host pipeline: PIL resize -> uint8 CHW.

    The rescale/normalize half runs ON DEVICE via `pixel_lut` — together the
    two are bit-identical to `process_images` (the LUT rows are computed by
    the same `rescale`/`normalize` functions), but the host->device upload
    carries 1 byte/pixel instead of 4 (fp32) or 2 (bf16). On the tunneled
    backend the upload path is the serving engine's bottleneck (~45 MB/s
    measured end-to-end — scripts/bench_h2d.py), so bytes ARE wall clock.
    """
    if resample is None and Image is not None:
        resample = Image.Resampling.BICUBIC
    out = []
    for image in images:
        img = resize(image, size=size, resample=resample)
        out.append(np.asarray(img, dtype=np.uint8).transpose(2, 0, 1))
    return out


def pixel_lut(
    rescale_factor: float = 1 / 255.0,
    image_mean=IMAGENET_STANDARD_MEAN,
    image_std=IMAGENET_STANDARD_STD,
) -> np.ndarray:
    """(3, 256) fp32 table: ``lut[c, v]`` = the host pipeline's output for
    byte value ``v`` in channel ``c``.

    Computed BY `rescale`/`normalize` themselves (including their uint8 ->
    float64 -> float32 double-rounding), so a device-side ``lut[c, pix]``
    gather over `process_images_uint8` output is bit-identical to
    `process_images` — no re-derivation of the arithmetic on device, where
    fp32 op-ordering could differ by an ulp and flip a downstream bf16
    rounding.
    """
    # A (1, 256, 3) "image": H=1, W=256 byte ramp, C=3 — broadcasts mean/std
    # per channel exactly like a real HWC frame.
    ramp = np.broadcast_to(
        np.arange(256, dtype=np.uint8)[None, :, None], (1, 256, 3)
    )
    arr = rescale(ramp, scale=rescale_factor)
    arr = normalize(arr, mean=image_mean, std=image_std)
    return np.ascontiguousarray(arr[0].transpose(1, 0))  # (3, 256) fp32


@jax.jit
def apply_pixel_lut(lut: jnp.ndarray, pix_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, H, W) uint8 -> (B, 3, H, W) lut.dtype via per-channel gather.

    `lut` is `pixel_lut()` pre-cast to the consumer dtype (gathering a
    pre-cast table equals casting gathered fp32 values — gathers don't
    change values). Dispatched once per join group right behind the uint8
    upload, so it rides the device pipeline.
    """
    idx = pix_u8.astype(jnp.int32)
    return jnp.stack(
        [jnp.take(lut[c], idx[:, c], axis=0) for c in range(3)], axis=1
    )


def pixel_affine_coeffs(
    rescale_factor: float = 1 / 255.0,
    image_mean=IMAGENET_STANDARD_MEAN,
    image_std=IMAGENET_STANDARD_STD,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel fp32 ``(center, mul)`` so that ``(u - center) * mul`` is
    the rescale/normalize affine: center = mean/rescale (127.5 for the
    imagenet-standard constants — exact in fp32), mul = rescale/std.

    The subtract-first form is deliberate: the algebraically equal
    ``u * mul + add`` suffers catastrophic cancellation at the mean pixel
    (u*mul ~ 1 there), amplifying mul's half-ulp rounding ~60 fp32 ulps —
    and the u=127 output (-1/255) sits only ~15 ulps from an exact bf16
    rounding midpoint, so the madd form flips that byte's bf16 value on
    any backend that doesn't fuse an FMA (measured: TPU flips it, XLA:CPU
    fuses and doesn't). ``(u - center)`` is exact, leaving ONE fp32
    rounding total — inside the margin on every backend.

    Still a candidate only: a consumer MUST verify it ON ITS OWN BACKEND
    against `pixel_lut` over the full 0..255 ramp in the consumer dtype
    (768 values, one tiny dispatch) and fall back to the gather on any
    mismatch (`ContinuousBatcher.__init__` does exactly this). The payoff:
    the serving trace showed the 4.8M-element per-group LUT gather running
    at ~127M elem/s on the VPU (302 ms/run, 8.8% of serving device time)
    while the elementwise affine is HBM-bound (~0.2 ms).
    """
    mean = np.asarray(image_mean, np.float64)
    std = np.asarray(image_std, np.float64)
    center = (mean / np.float64(rescale_factor)).astype(np.float32)
    mul = (np.float64(rescale_factor) / std).astype(np.float32)
    return center, mul


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def apply_pixel_affine(center, mul, pix_u8: jnp.ndarray, out_dtype):
    """(B, 3, H, W) uint8 -> (B, 3, H, W) out_dtype via fp32 subtract-scale.

    Drop-in for `apply_pixel_lut` ONLY after the ramp-equality check in the
    consumer dtype passes on the executing backend (see
    `pixel_affine_coeffs`)."""
    x = pix_u8.astype(jnp.float32)
    y = (x - center[None, :, None, None]) * mul[None, :, None, None]
    return y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def preprocess_jit(raw_images, height: int, width: int):
    """On-device batched preprocessing: (B, H0, W0, 3) uint8 -> (B, 3, H, W) f32.

    Fused resize/rescale/normalize compiled by XLA — the TPU-native analog of
    the host pipeline for batched serving. Bicubic resize kernel is XLA's,
    not PIL's (small pixel-level differences are expected and tested for).
    """
    x = raw_images.astype(jnp.float32)
    b = x.shape[0]
    x = jax.image.resize(x, (b, height, width, 3), method="bicubic")
    x = x / 255.0
    mean = jnp.asarray(IMAGENET_STANDARD_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STANDARD_STD, jnp.float32)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)


class ByteTokenizer:
    """Self-contained byte-level tokenizer implementing the HF protocol subset
    the processor needs. Layout: ids 0..255 = raw bytes, then specials.

    Used for tests and offline demos where the Gemma sentencepiece assets are
    unavailable; any HF ``AutoTokenizer`` can be dropped in instead.
    """

    def __init__(self):
        self._token_to_id = {}
        self._id_to_token = {}
        self.bos_token = "<bos>"
        self.eos_token = "<eos>"
        self.pad_token = "<pad>"
        self._next_id = 256
        for tok in [self.pad_token, self.bos_token, self.eos_token]:
            self._add(tok)
        self.add_bos_token = True
        self.add_eos_token = False

    def _add(self, token: str) -> int:
        if token not in self._token_to_id:
            self._token_to_id[token] = self._next_id
            self._id_to_token[self._next_id] = token
            self._next_id += 1
        return self._token_to_id[token]

    @property
    def bos_token_id(self) -> int:
        return self._token_to_id[self.bos_token]

    @property
    def eos_token_id(self) -> int:
        return self._token_to_id[self.eos_token]

    @property
    def pad_token_id(self) -> int:
        return self._token_to_id[self.pad_token]

    @property
    def vocab_size(self) -> int:
        return self._next_id

    def add_special_tokens(self, tokens_to_add: dict) -> int:
        added = 0
        for tok in tokens_to_add.get("additional_special_tokens", []):
            self._add(tok)
            added += 1
        return added

    def add_tokens(self, tokens: List[str]) -> int:
        for tok in tokens:
            self._add(tok)
        return len(tokens)

    def convert_tokens_to_ids(self, token: str) -> int:
        return self._token_to_id[token]

    def _tokenize_one(self, text: str) -> List[int]:
        ids: List[int] = []
        i = 0
        t2i = self._token_to_id
        while i < len(text):
            matched = False
            if text[i] == "<":
                # Every special token is a single "<...>" unit with no inner
                # ">", so the minimal bracketed span IS the longest-match —
                # one dict lookup instead of scanning ~1.2k candidates per
                # position (the scan cost ~100 ms per templated prompt: 256
                # "<image>" repeats x the whole special vocabulary).
                end = text.find(">", i)
                if end != -1:
                    tid = t2i.get(text[i : end + 1])
                    if tid is not None:
                        ids.append(tid)
                        i = end + 1
                        matched = True
            if not matched:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        if self.add_bos_token:
            ids = [self.bos_token_id] + ids
        if self.add_eos_token:
            ids = ids + [self.eos_token_id]
        return ids

    def __call__(self, texts, padding="longest", truncation=True, return_tensors=None):
        seqs = [self._tokenize_one(t) for t in texts]
        max_len = max(len(s) for s in seqs)
        input_ids = np.full((len(seqs), max_len), self.pad_token_id, np.int32)
        attention_mask = np.zeros((len(seqs), max_len), np.int32)
        for i, s in enumerate(seqs):
            input_ids[i, : len(s)] = s
            attention_mask[i, : len(s)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        raw = bytearray()
        out = []
        for i in np.asarray(ids).reshape(-1).tolist():
            if i < 256:
                raw.append(i)
            else:
                if raw:
                    out.append(raw.decode("utf-8", errors="replace"))
                    raw = bytearray()
                if not skip_special_tokens:
                    out.append(self._id_to_token.get(int(i), ""))
        if raw:
            out.append(raw.decode("utf-8", errors="replace"))
        return "".join(out)


def _tokenizer_id_bound(processor) -> int:
    """Smallest table size covering every id the tokenizer can emit.

    HF's ``vocab_size`` EXCLUDES added tokens (the <loc>/<seg>/<image> ids
    the processor itself registers), so also consider ``len(tokenizer)`` and
    the highest registered task-token ids.
    """
    tok = processor.tokenizer
    bound = getattr(tok, "vocab_size", 0) or 0
    try:
        bound = max(bound, len(tok))
    except TypeError:
        pass
    bound = max(bound, processor.image_token_id + 1)
    for marker in ("<seg127>", "<loc1023>"):
        try:
            tid = tok.convert_tokens_to_ids(marker)
            if tid is not None and tid >= 0:
                bound = max(bound, int(tid) + 1)
        except Exception:
            pass
    return bound


def align_config(cfg, processor):
    """Return ``cfg`` with the tokenizer contract applied: image_token_index
    = the processor's actual ``<image>`` id, and BOTH vocab sizes (composite
    and nested text config — the embedding table is sized from
    ``text_config.vocab_size``) grown to cover every id the tokenizer can
    emit, INCLUDING added tokens (HF's ``vocab_size`` excludes them). Without
    the nested replace, out-of-range ids silently clamp in ``jnp.take`` and
    merge garbage rows.
    """
    import dataclasses

    v = max(cfg.text_config.vocab_size, _tokenizer_id_bound(processor))
    return dataclasses.replace(
        cfg,
        image_token_index=processor.image_token_id,
        vocab_size=max(cfg.vocab_size, v),
        text_config=dataclasses.replace(cfg.text_config, vocab_size=v),
    )


def assert_aligned(processor, cfg) -> None:
    """Fail loudly if the processor's tokenizer and the model config disagree
    — a silent mismatch merges image features at the wrong positions (the
    fragile convention the byte-tokenizer demo paths rely on). Call where a
    processor and a config first meet (drivers, serving engines).
    """
    if processor.image_token_id != cfg.image_token_index:
        raise ValueError(
            f"processor <image> id {processor.image_token_id} != "
            f"cfg.image_token_index {cfg.image_token_index}: align the config "
            "with processing.align_config(cfg, processor) before building "
            "model inputs"
        )
    bound = _tokenizer_id_bound(processor)
    if bound > cfg.text_config.vocab_size:
        raise ValueError(
            f"tokenizer can emit ids up to {bound - 1}, out of range for "
            f"the embedding table (text vocab {cfg.text_config.vocab_size}); "
            "use processing.align_config(cfg, processor)"
        )


class PaliGemmaProcessor:
    """Image + prompt -> model inputs (reference: processing_paligemma.py:52-117)."""

    IMAGE_TOKEN = IMAGE_TOKEN

    def __init__(self, tokenizer, num_image_tokens: int, image_size: int):
        self.image_seq_length = num_image_tokens
        self.image_size = image_size

        tokenizer.add_special_tokens(
            {"additional_special_tokens": [self.IMAGE_TOKEN]}
        )
        extra = [f"<loc{i:04d}>" for i in range(1024)]
        extra += [f"<seg{i:03d}>" for i in range(128)]
        tokenizer.add_tokens(extra)
        self.image_token_id = tokenizer.convert_tokens_to_ids(self.IMAGE_TOKEN)
        tokenizer.add_bos_token = False
        tokenizer.add_eos_token = False
        self.tokenizer = tokenizer

    def __call__(
        self,
        text: List[str],
        images: List,
        padding: str = "longest",
        truncation: bool = True,
        raw_uint8: bool = False,
    ) -> dict:
        assert len(images) == len(text), (
            f"Received {len(images)} images for {len(text)} prompts."
        )

        if raw_uint8:
            # Upload-light serving path: resized uint8 CHW; the caller
            # finishes rescale/normalize on device with `apply_pixel_lut`
            # (bit-identical to the host pipeline below — see `pixel_lut`).
            pixel_values = process_images_uint8(
                images, size=(self.image_size, self.image_size)
            )
        else:
            pixel_values = process_images(
                images,
                size=(self.image_size, self.image_size),
                rescale_factor=1 / 255.0,
                image_mean=IMAGENET_STANDARD_MEAN,
                image_std=IMAGENET_STANDARD_STD,
            )
        pixel_values = np.stack(pixel_values, axis=0)

        input_strings = [
            add_image_tokens_to_prompt(
                prefix_prompt=prompt,
                bos_token=self.tokenizer.bos_token,
                image_seq_len=self.image_seq_length,
                image_token=self.IMAGE_TOKEN,
            )
            for prompt in text
        ]

        inputs = self.tokenizer(
            input_strings, padding=padding, truncation=truncation
        )
        input_ids = np.asarray(inputs["input_ids"], np.int32)
        attention_mask = np.asarray(inputs["attention_mask"], np.int32)
        # Remap the tokenizer's <image> id onto the model's image_token_index
        # happens at model level via cfg.image_token_index == tokenizer id for
        # real checkpoints; for the byte tokenizer callers align the config.
        return {
            "pixel_values": pixel_values,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
        }

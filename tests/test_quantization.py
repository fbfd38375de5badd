"""int8 weight-only quantization: error bounds and end-to-end behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu import generation
from paligemma_tpu.models import paligemma
from paligemma_tpu.quantization import (
    QTensor,
    dequantize,
    params_bytes,
    quantize_params,
    quantize_tensor,
)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128))
    qt = quantize_tensor(w, axis=0)
    assert qt.q.dtype == jnp.int8
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w))
    amax = np.abs(np.asarray(w)).max(axis=0)
    # error bounded by half an int8 step per channel
    assert np.all(err <= (amax / 127.0) * 0.5 + 1e-6)


def test_quantized_params_smaller(params):
    qp = quantize_params(params, llm_only=False)
    assert params_bytes(qp) < 0.45 * params_bytes(params)


def test_llm_only_leaves_vision_bf16(params):
    qp = quantize_params(params, llm_only=True)
    assert not isinstance(qp["vision"]["layers"]["attn"]["qkv"]["kernel"], QTensor)
    assert isinstance(qp["llm"]["layers"]["qkv"], QTensor)
    assert isinstance(qp["llm"]["embed"], QTensor)


def test_quantized_forward_close(params, cfg, sample_inputs):
    """Quantized logits stay close to fp32 logits (top-1 agreement on the
    final position and bounded normalized error)."""
    ids, pix = sample_inputs
    ref = paligemma.forward_nocache(params, cfg, ids, pix)
    qp = quantize_params(params)
    out = paligemma.forward_nocache(qp, cfg, ids, pix)
    ref_l = np.asarray(ref[0, -1]).astype(np.float64)
    out_l = np.asarray(out[0, -1]).astype(np.float64)
    cos = np.dot(ref_l, out_l) / (np.linalg.norm(ref_l) * np.linalg.norm(out_l))
    assert cos > 0.999, cos
    # Top-1 must agree unless the fp32 logits are themselves a near-tie
    # (random tiny-model logits can tie within the int8 noise floor; the real
    # model's token identity is checked end-to-end on TPU by bench.py).
    margin = float(ref_l.max() - ref_l[int(np.argmax(out_l))])
    assert int(np.argmax(ref_l)) == int(np.argmax(out_l)) or margin < 0.05, margin


def test_quantized_generation_runs(params, cfg, sample_inputs):
    ids, pix = sample_inputs
    qp = quantize_params(params)
    toks, _ = generation.generate(
        qp, cfg, ids, pix, 5, eos_token_id=-1,
        cache_dtype=jnp.float32, stop_at_eos=False,
    )
    assert len(toks) == 5
    # greedy decode of the tiny model should match unquantized closely
    ref_toks, _ = generation.generate(
        params, cfg, ids, pix, 5, eos_token_id=-1,
        cache_dtype=jnp.float32, stop_at_eos=False,
    )
    if toks[0] != ref_toks[0]:
        # Allow a flip only on a genuine fp32 near-tie (random tiny-model
        # logits can tie within the int8 noise floor).
        ref_l = np.asarray(
            paligemma.forward_nocache(params, cfg, ids, pix)[0, -1], np.float64
        )
        margin = float(ref_l.max() - ref_l[toks[0]])
        assert margin < 0.05, (toks[0], ref_toks[0], margin)


def test_bf16_serving_dtype_argmax_agreement(params, cfg, sample_inputs):
    """bf16 params (the TPU serving dtype) keep fp32's greedy decisions on
    the tiny model — the dtype analog of the fp16-weight reference."""
    ids, pix = sample_inputs
    ref = paligemma.forward_nocache(params, cfg, ids, pix)
    bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    out = paligemma.forward_nocache(bf, cfg, ids, pix.astype(jnp.bfloat16))
    assert int(jnp.argmax(ref[0, -1])) == int(jnp.argmax(out[0, -1]))


# ---------------------------------------------------------------------------
# int4 (packed) weight-only path
# ---------------------------------------------------------------------------


def test_int4_pack_unpack_roundtrip():
    from paligemma_tpu.ops.pallas_quant import pack_int4, unpack_int4

    rng = np.random.RandomState(0)
    q = rng.randint(-7, 8, (3, 64, 1024)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (3, 64, 512) and packed.dtype == jnp.int8
    back = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(back), q)


def test_q4_matmul_matches_xla_and_dequant():
    from paligemma_tpu.ops.pallas_quant import (
        pack_int4, q4_matmul, q4_matmul_xla,
    )

    rng = np.random.RandomState(1)
    d, o, bt = 64, 1024, 2
    q = rng.randint(-7, 8, (d, o)).astype(np.int8)
    scale = (rng.rand(1, o).astype(np.float32) + 0.5) * 0.01
    x = jnp.asarray(rng.randn(1, bt, d).astype(np.float32))
    packed = pack_int4(jnp.asarray(q))

    ref = jnp.einsum("btd,de->bte", x, jnp.asarray(q, jnp.float32)) * scale[None]
    out_k = q4_matmul(x, packed, jnp.asarray(scale))
    out_x = q4_matmul_xla(x, packed, jnp.asarray(scale))
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_cli_cache_dtype_guard_for_quantized_params(tmp_path):
    """test_inference must NOT infer an int8 activation/KV dtype from a
    quantized param tree (the first leaf is the int8 embed q-tensor):
    default-dtype output == explicit-bf16 output, token for token."""
    import jax
    from PIL import Image

    from inference import load_for_cli, test_inference

    params, cfg, proc = load_for_cli(None, True, "int8")
    assert jnp.issubdtype(jax.tree.leaves(params)[0].dtype, jnp.integer)
    img = tmp_path / "img.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8)
    ).save(str(img))
    args = (params, cfg, proc, "what?", str(img), 4, 0.0, 0.9, False)
    assert test_inference(*args) == test_inference(
        *args, cache_dtype=jnp.bfloat16
    )


def test_q8_matmul_matches_qproj():
    from paligemma_tpu.ops.pallas_quant import q8_matmul
    from paligemma_tpu.quantization import QTensor, qproj

    rng = np.random.RandomState(2)
    d, o, bt = 64, 1024, 2
    q = rng.randint(-127, 128, (d, o)).astype(np.int8)
    scale = (rng.rand(1, o).astype(np.float32) + 0.5) * 0.01
    x = jnp.asarray(rng.randn(1, bt, d).astype(np.float32))

    ref = qproj(x, QTensor(q=jnp.asarray(q), scale=jnp.asarray(scale)))
    out = q8_matmul(x, jnp.asarray(q), jnp.asarray(scale), 512, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_int4_model_forward_close(params, cfg, sample_inputs):
    """Two bars: (a) the in-kernel unpack path must match a dense
    dequantized-weights forward almost exactly (kernel correctness); (b) the
    int4 model stays distributionally close to fp32 (quantization quality —
    loose on the tiny 32-dim-contraction geometry; int4 is the measured
    experiment arm, not the headline serving config)."""
    ids, pix = sample_inputs
    ref = paligemma.forward_nocache(params, cfg, ids, pix)
    qp = quantize_params(params, mode="int4")
    from paligemma_tpu.ops.pallas_quant import Q4Tensor, unpack_int4
    from paligemma_tpu.quantization import dequantize

    assert isinstance(qp["llm"]["layers"]["qkv"], Q4Tensor)
    assert qp["llm"]["layers"]["qkv"].packed.dtype == jnp.int8
    out = paligemma.forward_nocache(qp, cfg, ids, pix)

    # (a) dequant oracle: same int4 values as dense fp32 weights.
    dq = jax.tree.map(lambda x: x, params)
    layers = dict(dq["llm"]["layers"])
    for name in ("qkv", "o", "gate_up", "down"):
        qt = qp["llm"]["layers"][name]
        layers[name] = unpack_int4(qt.packed).astype(jnp.float32) * qt.scale
    llm = dict(dq["llm"])
    llm["layers"] = layers
    llm["embed"] = dequantize(qp["llm"]["embed"], jnp.bfloat16).astype(jnp.float32)
    dq["llm"] = llm
    oracle = paligemma.forward_nocache(dq, cfg, ids, pix)
    out_l = np.asarray(out[0, -1]).astype(np.float64)
    ora_l = np.asarray(oracle[0, -1]).astype(np.float64)
    cos_k = np.dot(out_l, ora_l) / (np.linalg.norm(out_l) * np.linalg.norm(ora_l))
    assert cos_k > 0.9995, cos_k

    # (b) quantization quality vs fp32.
    ref_l = np.asarray(ref[0, -1]).astype(np.float64)
    cos = np.dot(ref_l, out_l) / (np.linalg.norm(ref_l) * np.linalg.norm(out_l))
    assert cos > 0.98, cos


def test_int4_generation_runs(params, cfg, sample_inputs):
    ids, pix = sample_inputs
    qp = quantize_params(params, mode="int4")
    toks, _ = generation.generate(
        qp, cfg, ids, pix, 4, eos_token_id=-1,
        cache_dtype=jnp.float32, stop_at_eos=False,
    )
    assert len(toks) == 4


# ---------------------------------------------------------------------------
# w4a8: int4 weights + int8 activations on the MXU (one-shift unpack)
# ---------------------------------------------------------------------------


def test_w4a8_pack_unpack_roundtrip():
    from paligemma_tpu.ops.pallas_quant import pack_int4_mxu, unpack_int4_mxu

    rng = np.random.RandomState(0)
    q = rng.randint(-7, 8, (3, 64, 1024)).astype(np.int8)
    packed = pack_int4_mxu(jnp.asarray(q))
    assert packed.shape == (3, 64, 512) and packed.dtype == jnp.int8
    back = unpack_int4_mxu(packed)
    np.testing.assert_array_equal(np.asarray(back), q)


def test_q4a8_matmul_exact_integer_oracle():
    """The w4a8 kernel's nibble recovery (hi = dot2, lo = dot1 - 16*dot2 -
    8*rowsum) is exact integer arithmetic: the kernel, the XLA reference
    path, and a numpy s32 oracle must agree to the last bit (before the
    shared fp32 rescale)."""
    from paligemma_tpu.ops.pallas_quant import (
        pack_int4_mxu, q4a8_matmul, q4a8_matmul_xla, quantize_rows_s8,
    )

    rng = np.random.RandomState(1)
    d, o = 64, 1024
    q = rng.randint(-7, 8, (d, o)).astype(np.int8)
    scale = (rng.rand(1, o).astype(np.float32) + 0.5) * 0.01
    x = jnp.asarray(rng.randn(2, 3, d).astype(np.float32))
    packed = pack_int4_mxu(jnp.asarray(q))

    out_k = q4a8_matmul(x, packed, jnp.asarray(scale))
    out_x = q4a8_matmul_xla(x, packed, jnp.asarray(scale))
    xq, xs, _ = quantize_rows_s8(x.reshape(6, d))
    ref = (np.asarray(xq, np.int32) @ q.astype(np.int32)).astype(np.float32)
    ref = (ref * np.asarray(xs) * scale).reshape(2, 3, o)
    np.testing.assert_array_equal(np.asarray(out_k), ref)
    np.testing.assert_array_equal(np.asarray(out_x).reshape(2, 3, o), ref)


def test_q4a8_tiled_pack_and_matmul_exact():
    """Pack-time-tiled layout: roundtrip exact, and the tiled kernel matches
    the numpy s32 oracle to the last bit (same recovery as the flat kernel,
    contiguous per-program DMA tiles)."""
    from paligemma_tpu.ops.pallas_quant import (
        pack_int4_mxu_tiled, q4a8_matmul_tiled, quantize_rows_s8,
        unpack_int4_mxu_tiled,
    )

    rng = np.random.RandomState(2)
    d, o = 4096, 1024
    q = rng.randint(-7, 8, (d, o)).astype(np.int8)
    scale = (rng.rand(1, o).astype(np.float32) + 0.5) * 0.01
    x = jnp.asarray(rng.randn(1, 3, d).astype(np.float32))
    tiled = pack_int4_mxu_tiled(jnp.asarray(q))
    assert tiled.shape == (2, 2, 2048, 256)  # (nb_o, nb_d, block_d, half)
    np.testing.assert_array_equal(np.asarray(unpack_int4_mxu_tiled(tiled)), q)

    out = q4a8_matmul_tiled(x, tiled, jnp.asarray(scale))
    xq, xs, _ = quantize_rows_s8(x.reshape(3, d))
    ref = (np.asarray(xq, np.int32) @ q.astype(np.int32)).astype(np.float32)
    ref = (ref * np.asarray(xs) * scale).reshape(1, 3, o)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_lm_head_w4_logits_route():
    """4-bit tied lm_head (runtime.lm_head_w4): quantize_embed_w4's padded
    transposed pack + the GEMV logits route must (a) emit fp32, (b) slice
    off the pad vocab columns, (c) match the int4xint8 integer oracle
    exactly, and (d) leave matrix-shaped calls on the int8 einsum path."""
    from paligemma_tpu import runtime
    from paligemma_tpu.models import gemma
    from paligemma_tpu.ops.pallas_quant import quantize_rows_s8
    from paligemma_tpu.quantization import (
        QTensor, quantize_embed_w4, quantize_tensor,
    )

    rng = np.random.RandomState(7)
    v, d = 1000, 256  # pads to 1024 vocab columns
    emb = jnp.asarray(rng.randn(v, d).astype(np.float32))
    w4 = quantize_embed_w4(emb)
    assert w4.packed.shape == (1, 1, d, 512)  # one 1024-col block
    params = {"embed": quantize_tensor(emb, axis=1), "embed_w4": w4}

    x = jnp.asarray(rng.randn(1, 2, d).astype(np.float32))
    old = runtime.lm_head_w4
    try:
        runtime.lm_head_w4 = True
        lg = gemma.logits(params, x)
        assert lg.shape == (1, 2, v) and lg.dtype == jnp.float32

        # integer oracle: per-row a8 activations x per-vocab-row int4
        scale = np.maximum(np.abs(np.asarray(emb)).max(1), 1e-8) / 7.0
        qw = np.clip(np.round(np.asarray(emb) / scale[:, None]), -7, 7)
        xq, xs, _ = quantize_rows_s8(x.reshape(2, d))
        ref = (np.asarray(xq, np.int32) @ qw.T.astype(np.int32))
        ref = ref.astype(np.float32) * np.asarray(xs) * scale[None, :]
        # Integer accumulation is exact; the hi-nibble 16x/\16 scale
        # factoring differs from the oracle's multiply order by ~1 ulp.
        np.testing.assert_allclose(np.asarray(lg)[0], ref, rtol=1e-6,
                                   atol=1e-5)

        # matrix-shaped call: stays on the exact int8 path (no a8 error)
        xm = jnp.asarray(rng.randn(1, 65, d).astype(np.float32))
        lg_m = gemma.logits(params, xm)
        emb_q = params["embed"]
        want = (xm @ emb_q.q.astype(xm.dtype).T).astype(jnp.float32)
        want = want * emb_q.scale.reshape(1, 1, -1)
        np.testing.assert_allclose(
            np.asarray(lg_m), np.asarray(want), rtol=1e-5, atol=1e-5
        )
    finally:
        runtime.lm_head_w4 = old


def test_mlp_w4a8_fused_matches_unfused():
    """The one-kernel fused MLP (gate_up -> gelu-gate -> requant -> down)
    must match the unfused pair of tiled GEMV calls. Not bit-exact on the
    CPU interpreter (interpret mode skips an intermediate bf16 rounding of
    the gated activation that real hardware and the unfused path apply), so
    the bar is one-activation-quant-step closeness; TPU model-level token
    agreement is measured in int4_bench.json."""
    from paligemma_tpu.ops.pallas_quant import (
        Q4A8TiledTensor, mlp_w4a8, pack_int4_mxu_tiled, q4a8_matmul_tiled,
    )

    rng = np.random.RandomState(3)
    d, inter = 256, 512
    for bt in (1, 5):
        qg = rng.randint(-7, 8, (d, 2 * inter)).astype(np.int8)
        sg = (rng.rand(1, 2 * inter).astype(np.float32) + 0.5) * 0.01
        qd = rng.randint(-7, 8, (inter, d)).astype(np.int8)
        sd = (rng.rand(1, d).astype(np.float32) + 0.5) * 0.01
        gu = Q4A8TiledTensor(pack_int4_mxu_tiled(jnp.asarray(qg)),
                             jnp.asarray(sg))
        dn = Q4A8TiledTensor(pack_int4_mxu_tiled(jnp.asarray(qd)),
                             jnp.asarray(sd))
        x = jnp.asarray(rng.randn(1, bt, d), jnp.bfloat16)
        fused = mlp_w4a8(x, gu, dn, inter).astype(jnp.float32)
        h = q4a8_matmul_tiled(x, gu.packed, gu.scale)
        act = jax.nn.gelu(
            h[..., :inter].astype(jnp.float32), approximate=True
        ).astype(x.dtype)
        ref = q4a8_matmul_tiled(
            act * h[..., inter:], dn.packed, dn.scale
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=0.05, atol=0.05
        )


def test_mlp_w4a8_stacked_matches_sliced_multiblock():
    """The scalar-prefetch stacked kernel (mlp_w4a8_stacked — the decoder's
    scan path, which indexes the FULL (L, ...) packed stack by layer) must be
    bit-identical to the per-layer sliced fused kernel, and close to the
    unfused oracle, at a multi-block geometry (nb_gu>1, nb_dgu>1, nb_od>1,
    nb_dd>1 — the blocking the real 3B model runs; ADVICE r4 asked for this
    cross-block coverage)."""
    from paligemma_tpu.ops.pallas_quant import (
        Q4A8TiledTensor, mlp_w4a8, mlp_w4a8_stacked, pack_int4_mxu_tiled,
        q4a8_matmul_tiled, regroup_scales_stacked,
    )

    rng = np.random.RandomState(7)
    L, d, inter = 3, 256, 512
    # Overridden blocks: gate_up (d, 2*inter) -> nb_gu=4, nb_dgu=2;
    # down (inter, d) -> nb_od=2, nb_dd=4.
    qg = rng.randint(-7, 8, (L, d, 2 * inter)).astype(np.int8)
    sg = ((rng.rand(L, 1, 2 * inter) + 0.5) * 0.01).astype(np.float32)
    qd = rng.randint(-7, 8, (L, inter, d)).astype(np.int8)
    sd = ((rng.rand(L, 1, d) + 0.5) * 0.01).astype(np.float32)
    gu_packed = pack_int4_mxu_tiled(jnp.asarray(qg), block_o=256, block_d=128)
    dn_packed = pack_int4_mxu_tiled(jnp.asarray(qd), block_o=128, block_d=128)
    assert gu_packed.shape == (L, 4, 2, 128, 128)
    assert dn_packed.shape == (L, 2, 4, 128, 64)
    gu_s2 = regroup_scales_stacked(jnp.asarray(sg), 4, 128)
    dn_s2 = regroup_scales_stacked(jnp.asarray(sd), 2, 64)
    x = jnp.asarray(rng.randn(1, 2, d), jnp.bfloat16)

    for l in range(L):
        stacked = mlp_w4a8_stacked(
            x, gu_packed, gu_s2, dn_packed, dn_s2,
            jnp.int32(l), inter,
        )
        sliced = mlp_w4a8(
            x,
            Q4A8TiledTensor(gu_packed[l], jnp.asarray(sg[l])),
            Q4A8TiledTensor(dn_packed[l], jnp.asarray(sd[l])),
            inter,
        )
        np.testing.assert_array_equal(
            np.asarray(stacked.astype(jnp.float32)),
            np.asarray(sliced.astype(jnp.float32)),
        )
        h = q4a8_matmul_tiled(x, gu_packed[l], jnp.asarray(sg[l]))
        act = jax.nn.gelu(
            h[..., :inter].astype(jnp.float32), approximate=True
        ).astype(x.dtype)
        ref = q4a8_matmul_tiled(
            act * h[..., inter:], dn_packed[l], jnp.asarray(sd[l])
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(stacked.astype(jnp.float32)), np.asarray(ref),
            rtol=0.05, atol=0.05,
        )


def test_w4a8_cached_decode_matches_nocache_argmax(params, cfg, sample_inputs):
    """Cached w4a8 decode (the scan path that routes through the stacked
    scalar-prefetch kernel at bt=1) must make the same greedy decisions as
    the w4a8 no-cache forward — the quant analog of the reference's
    cached-vs-uncached token-identity check (ablation_study_fixed.py:427)."""
    ids, pix = sample_inputs
    qp = quantize_params(params, mode="w4a8")
    toks_cached, _ = generation.generate(
        qp, cfg, ids, pix, 6, eos_token_id=-1,
        cache_dtype=jnp.float32, stop_at_eos=False,
    )
    cur = np.asarray(ids)
    toks_nc = []
    for _ in range(6):
        lg = paligemma.forward_nocache(qp, cfg, jnp.asarray(cur), pix)
        nxt = int(jnp.argmax(lg[0, -1]))
        toks_nc.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1)
    assert list(toks_cached) == toks_nc


def test_mlp_w4a8_wide_rows_fallback():
    """Above MLP_FUSED_MAX_ROWS the fused path falls back to the two-call
    tiled pipeline (VMEM scratch scales with rows) — same function, same
    contract."""
    from paligemma_tpu.ops import pallas_quant as PQ

    rng = np.random.RandomState(4)
    d, inter = 256, 512
    qg = rng.randint(-7, 8, (d, 2 * inter)).astype(np.int8)
    sg = (rng.rand(1, 2 * inter).astype(np.float32) + 0.5) * 0.01
    qd = rng.randint(-7, 8, (inter, d)).astype(np.int8)
    sd = (rng.rand(1, d).astype(np.float32) + 0.5) * 0.01
    gu = PQ.Q4A8TiledTensor(PQ.pack_int4_mxu_tiled(jnp.asarray(qg)),
                            jnp.asarray(sg))
    dn = PQ.Q4A8TiledTensor(PQ.pack_int4_mxu_tiled(jnp.asarray(qd)),
                            jnp.asarray(sd))
    x = jnp.asarray(rng.randn(2, PQ.MLP_FUSED_MAX_ROWS, d), jnp.bfloat16)
    out = PQ.mlp_w4a8(x, gu, dn, inter)
    assert out.shape == (2, PQ.MLP_FUSED_MAX_ROWS, d)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_w4a8_model_forward_close(params, cfg, sample_inputs):
    """w4a8 adds per-row activation quantization on top of int4 weights, so
    there is no exact dequant oracle at the model level (op-level exactness
    is pinned above); the model must stay distributionally close to fp32.
    Mixed scheme: qkv/o int8 (XLA path), gate_up/down tiled-w4a8 consumed by
    the fused MLP kernel."""
    ids, pix = sample_inputs
    ref = paligemma.forward_nocache(params, cfg, ids, pix)
    qp = quantize_params(params, mode="w4a8")
    from paligemma_tpu.ops.pallas_quant import Q4A8TiledTensor
    from paligemma_tpu.quantization import QTensor

    assert isinstance(qp["llm"]["layers"]["qkv"], QTensor)
    assert isinstance(qp["llm"]["layers"]["gate_up"], Q4A8TiledTensor)
    assert qp["llm"]["layers"]["gate_up"].packed.dtype == jnp.int8
    out = paligemma.forward_nocache(qp, cfg, ids, pix)
    ref_l = np.asarray(ref[0, -1]).astype(np.float64)
    out_l = np.asarray(out[0, -1]).astype(np.float64)
    cos = np.dot(ref_l, out_l) / (np.linalg.norm(ref_l) * np.linalg.norm(out_l))
    assert cos > 0.98, cos


def test_w4a8_generation_runs(params, cfg, sample_inputs):
    ids, pix = sample_inputs
    qp = quantize_params(params, mode="w4a8")
    toks, _ = generation.generate(
        qp, cfg, ids, pix, 4, eos_token_id=-1,
        cache_dtype=jnp.float32, stop_at_eos=False,
    )
    assert len(toks) == 4


def test_kv_row_quant_error_bound():
    """quantize_kv_rows: per-row amax/127 scale bounds the dequant error by
    half an int8 step per element (the int8-KV-cache fidelity argument)."""
    from paligemma_tpu.models.gemma import quantize_kv_rows

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 1, 64)) * 3.0
    q, scale = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and scale.shape == x.shape[:-1]
    deq = np.asarray(q, np.float32) * np.asarray(scale)[..., None]
    err = np.abs(deq - np.asarray(x))
    bound = np.asarray(scale)[..., None] * 0.5 + 1e-6
    assert np.all(err <= bound)


def test_int8_kv_cache_generation_matches(params, cfg, sample_inputs):
    """Single-stream generation with an int8 KV cache (cache_dtype=jnp.int8
    -> gemma.QuantKVCache): greedy tokens match the fp32-cache stream on the
    tiny model, through both the chunked and the speculative drivers."""
    ids, pix = sample_inputs
    kw = dict(max_new_tokens=10, eos_token_id=-1)
    base = generation.generate_chunked(
        params, cfg, ids, pix, cache_dtype=jnp.float32, chunk=4, **kw)
    q8 = generation.generate_chunked(
        params, cfg, ids, pix, cache_dtype=jnp.int8, chunk=4, **kw)
    assert q8 == base
    spec = generation.generate_spec(
        params, cfg, ids, pix, cache_dtype=jnp.int8, chunk=4, k=3, **kw)
    assert spec == base


# ---------------------------------------------------------------------------
# a8 prefill (both-operands-int8 MXU path, runtime.prefill_a8)
# ---------------------------------------------------------------------------


def test_qproj_a8_close_to_fp32():
    """qproj_a8 (per-token activation quant + s8xs8 accumulate) stays close
    to the fp32 matmul: activation quantization adds at most ~1% relative
    error on well-conditioned random inputs."""
    from paligemma_tpu.quantization import qproj_a8

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 96), jnp.float32)
    qt = quantize_tensor(w, axis=0)
    ref = x @ w
    out = np.asarray(qproj_a8(x, qt), np.float64)
    rel = np.linalg.norm(out - np.asarray(ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel


def test_qproj_a8_routing_is_static_on_length():
    """With the flag on, long-T calls take the a8 route and short-T calls
    keep the exact weight-only result; with the flag off nothing changes."""
    from paligemma_tpu import runtime
    from paligemma_tpu.quantization import qproj, qproj_a8

    x_long = jax.random.normal(jax.random.PRNGKey(0), (1, 40, 64), jnp.float32)
    x_short = x_long[:, :8]
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 96), jnp.float32)
    qt = quantize_tensor(w, axis=0)
    base_long = qproj(x_long, qt)
    base_short = qproj(x_short, qt)
    runtime.set_prefill_a8(True)
    try:
        np.testing.assert_array_equal(
            np.asarray(qproj(x_long, qt)), np.asarray(qproj_a8(x_long, qt)))
        np.testing.assert_array_equal(
            np.asarray(qproj(x_short, qt)), np.asarray(base_short))
        assert not np.array_equal(np.asarray(qproj(x_long, qt)),
                                  np.asarray(base_long))
    finally:
        runtime.set_prefill_a8(False)
    np.testing.assert_array_equal(np.asarray(qproj(x_long, qt)),
                                  np.asarray(base_long))


def test_prefill_a8_model_forward_close(params, cfg, sample_inputs):
    """Full-model forward with a8 prefill projections: last-position logits
    stay directionally identical to fp32 (cos > 0.99) on the tiny model.

    The flag is trace-time state, so caches are cleared around the flip
    (runtime.py docstring contract)."""
    from paligemma_tpu import runtime

    ids, pix = sample_inputs
    ref = paligemma.forward_nocache(params, cfg, ids, pix)
    qp = quantize_params(params)
    jax.clear_caches()
    runtime.set_prefill_a8(True)
    old_min = runtime.a8_min_seq
    runtime.a8_min_seq = 8  # tiny prompt is 22 tokens
    try:
        out = paligemma.forward_nocache(qp, cfg, ids, pix)
    finally:
        runtime.set_prefill_a8(False)
        runtime.a8_min_seq = old_min
        jax.clear_caches()
    ref_l = np.asarray(ref[0, -1]).astype(np.float64)
    out_l = np.asarray(out[0, -1]).astype(np.float64)
    cos = np.dot(ref_l, out_l) / (np.linalg.norm(ref_l) * np.linalg.norm(out_l))
    assert cos > 0.99, cos

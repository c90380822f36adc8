"""int8 quantized encoder path (ops/quant.py, vision_forward_int8).

The encoder is frozen (reference model.py:85-89), so W8A8 post-training
quantization is a pure serving optimization; these tests pin (a) the
quantizer's round-trip error bounds, (b) closeness of the int8 encoder
forward to the float path, and (c) internal consistency of the cls_only
narrowing on the int8 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mit_tpu.models.vision import (
    VisionConfig,
    init_vision_params,
    quantize_vision_params,
    vision_forward,
    vision_forward_int8,
)
from mit_tpu.ops.quant import dynamic_quantize, int8_matmul, quantize_weight

pytestmark = pytest.mark.slow  # heavy end-to-end module (see pyproject)

CFG = VisionConfig(
    family="vit", image_size=32, patch_size=8, hidden_size=64,
    num_layers=3, num_heads=4, intermediate_size=128,
)


@pytest.fixture(scope="module")
def params():
    return init_vision_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def qparams(params):
    return quantize_vision_params(params, CFG)


@pytest.fixture(scope="module")
def pixels():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32)


def test_weight_quant_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(1), (96, 64)) * 0.05
    q = quantize_weight(w)
    deq = q.w8.astype(jnp.float32) * q.scale[None, :]
    # symmetric int8: per-channel error bounded by scale/2 per element
    err = jnp.abs(deq - w)
    assert float(jnp.max(err / (q.scale[None, :] / 2 + 1e-12))) <= 1.0 + 1e-3


def test_dynamic_quantize_rows():
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 7, 32)) * 3.0
    x8, sx = dynamic_quantize(x)
    assert x8.dtype == jnp.int8 and sx.shape == (5, 7, 1)
    deq = x8.astype(jnp.float32) * sx
    assert float(jnp.max(jnp.abs(deq - x))) <= float(jnp.max(sx)) / 2 + 1e-6
    # each row's max magnitude hits 127 (symmetric full-range)
    assert int(jnp.min(jnp.max(jnp.abs(x8), axis=-1))) == 127


def test_int8_matmul_close_to_float():
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (6, 40, 64))
    w = jax.random.normal(kw, (64, 96)) * 0.05
    b = jnp.linspace(-1, 1, 96)
    ref = x @ w + b
    out = int8_matmul(x, quantize_weight(w, b), jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_matmul_stacked_layers():
    """Layer-stacked weights (L, K, N) against per-layer float matmuls."""
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (3, 10, 32))          # (L, T, K)
    w = jax.random.normal(kw, (3, 32, 48)) * 0.1    # (L, K, N)
    ref = jnp.einsum("ltk,lkn->ltn", x, w)
    out = int8_matmul(x, quantize_weight(w), jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_vision_close_to_float(params, qparams, pixels):
    ref = np.asarray(vision_forward(params, CFG, pixels, jnp.float32))
    out = np.asarray(vision_forward_int8(qparams, CFG, pixels, jnp.float32))
    cos = np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.999, cos
    rel = np.linalg.norm(ref - out) / np.linalg.norm(ref)
    assert rel < 0.05, rel


def test_int8_cls_only_consistent(qparams, pixels):
    """cls_only must equal full[:, :1] of the same int8 path (same
    guarantee the float path has)."""
    full = np.asarray(
        vision_forward_int8(qparams, CFG, pixels, jnp.float32)
    )[:, :1]
    cls = np.asarray(
        vision_forward_int8(qparams, CFG, pixels, jnp.float32, cls_only=True)
    )
    np.testing.assert_allclose(cls, full, atol=2e-6)


def test_int8_mega_kernel_matches_composition(params, qparams, pixels):
    """use_pallas=True routes through the whole-layer fused kernel
    (interpret mode off-TPU); it must match the XLA int8 composition."""
    ref = np.asarray(
        vision_forward_int8(qparams, CFG, pixels, jnp.float32,
                            use_pallas=False)
    )
    out = np.asarray(
        vision_forward_int8(qparams, CFG, pixels, jnp.float32,
                            use_pallas=True)
    )
    rel = np.linalg.norm(ref - out) / np.linalg.norm(ref)
    assert rel < 5e-3, rel


def test_int8_mega_kernel_cls_only(qparams, pixels):
    """cls_only under the kernel path tracks full[:, :1]. Not exact: the
    narrowed last layer runs the XLA path (f32 qkv) while full runs the
    kernel (bf16 qkv) — tolerance covers that representation gap."""
    full = np.asarray(
        vision_forward_int8(qparams, CFG, pixels, jnp.float32,
                            use_pallas=True)
    )[:, :1]
    cls = np.asarray(
        vision_forward_int8(qparams, CFG, pixels, jnp.float32,
                            use_pallas=True, cls_only=True)
    )
    cos = np.sum(full * cls) / (np.linalg.norm(full) * np.linalg.norm(cls))
    assert cos > 0.999, cos
    np.testing.assert_allclose(cls, full, atol=5e-2)


def test_int8_split_layer_matches_mega(qparams):
    """The two-pass (ViT-L) layer must equal the single mega-kernel up to
    the residual-stream round trip between halves (exact at f32 x)."""
    from mit_tpu.ops.pallas_int8_layer import (
        fused_int8_vit_layer,
        fused_int8_vit_layer_split,
    )

    lay = jax.tree.map(lambda a: a[0], qparams["layers"])
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 12, CFG.hidden_size),
                          jnp.float32)
    args = (lay["ln1"], lay["attn"]["qkv"], lay["attn"]["o"], lay["ln2"],
            lay["fc1"], lay["fc2"])
    mega = fused_int8_vit_layer(x, *args, num_heads=CFG.num_heads,
                                eps=CFG.layer_norm_eps)
    split = fused_int8_vit_layer_split(x, *args, num_heads=CFG.num_heads,
                                       eps=CFG.layer_norm_eps)
    np.testing.assert_allclose(np.asarray(mega), np.asarray(split),
                               rtol=1e-6, atol=1e-6)


def test_vmem_fit_dispatch():
    """ViT-B fits the mega-kernel; ViT-L falls to the split; both beat the
    composition fallback threshold."""
    from mit_tpu.ops.pallas_int8_layer import layer_fits_vmem, split_fits_vmem

    assert layer_fits_vmem(197, 768, 3072)          # ViT-B/16
    assert not layer_fits_vmem(257, 1024, 4096)     # ViT-L/14
    assert split_fits_vmem(257, 1024, 4096)


def test_attn_heads_per_chunk():
    """Batched-attention head chunking: all heads at once when the
    (H, T, T) f32 scores fit the scoped budget, else the largest divisor
    of H that does — never zero, always dividing H exactly."""
    from mit_tpu.ops.pallas_int8_layer import _attn_heads_per_chunk

    assert _attn_heads_per_chunk(12, 197) == 12        # ViT-B: one chunk
    hc = _attn_heads_per_chunk(16, 257)                # ViT-L split kernel
    assert 16 % hc == 0 and hc < 16                    # chunked, divides H
    assert hc * 257 * 257 * 4 <= (5 * 1024 * 1024) // 2
    for heads in (1, 3, 7, 12, 16, 24):
        for t in (8, 128, 197, 257, 1024):
            hc = _attn_heads_per_chunk(heads, t)
            assert 1 <= hc <= heads and heads % hc == 0


def test_kernel_compile_probe_graceful():
    """kernel_compiles never raises — on a backend that can't build the
    Mosaic kernel (this CPU host) it returns False and dispatch falls to
    the next tier (on TPU it's been verified True for ViT-B mega / ViT-L
    split and False for ViT-L mega)."""
    from mit_tpu.ops.pallas_int8_layer import kernel_compiles

    out = kernel_compiles("mega", 2, 197, 768, 3072, 12, 1e-12, "gelu",
                          "bfloat16")
    assert out in (True, False)


def test_int8_clip_family(pixels):
    """ln_pre / quick_gelu / no-patch-bias variant runs and tracks float,
    on both the XLA composition and the fused-kernel (interpret) path."""
    cfg = CFG._replace(family="clip", ln_pre=True, ln_post=False,
                       patch_bias=False, hidden_act="quick_gelu",
                       layer_norm_eps=1e-5)
    params = init_vision_params(jax.random.PRNGKey(5), cfg)
    qp = quantize_vision_params(params, cfg)
    ref = np.asarray(vision_forward(params, cfg, pixels, jnp.float32))
    out = np.asarray(vision_forward_int8(qp, cfg, pixels, jnp.float32))
    cos = np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.999, cos
    kern = np.asarray(
        vision_forward_int8(qp, cfg, pixels, jnp.float32, use_pallas=True)
    )
    cos_k = np.sum(ref * kern) / (np.linalg.norm(ref) * np.linalg.norm(kern))
    assert cos_k > 0.999, cos_k


def test_encode_images_routes_quantized(params, qparams, pixels):
    """encode_images auto-detects a quantized encoder subtree."""
    from mit_tpu.config import Config
    from mit_tpu.models.model import ModelConfig, encode_images

    mcfg = ModelConfig.build(Config(), vocab_size=100)._replace(vision=CFG)
    f_float = encode_images({"encoder": params}, mcfg, pixels, jnp.float32)
    f_int8 = encode_images({"encoder": qparams}, mcfg, pixels, jnp.float32)
    assert f_float.shape == f_int8.shape == (4, 1, CFG.hidden_size)
    cos = float(
        jnp.sum(f_float * f_int8)
        / (jnp.linalg.norm(f_float) * jnp.linalg.norm(f_int8))
    )
    assert cos > 0.99, cos

"""Int8 PTQ engine (models/quantized_generator.py) — CPU correctness.

The engine's one non-standard idea is exactness of scale absorption:
InstanceNorm removes per-channel affine maps, so conv->IN chains feed the
raw int32 accumulator to IN. These tests pin (1) that algebra, (2) the
int8 conv primitives against a float reference, (3) whole-forward
divergence against the bf16 noise floor of the same (chaotic,
random-init) network, and (4) calibration/quantization plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.core.norm import instance_norm
from multi_style_transfer_gan_tpu.models import (
    enhanced_generator_apply, enhanced_generator_init,
)
from multi_style_transfer_gan_tpu.models import quantized_generator as qg


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_instance_norm_absorbs_per_channel_affine(rng):
    """IN(s*y + b) == IN(y) — the identity the engine's no-dequant path
    rests on."""
    y = jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.1, 10.0, (6,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((6,)) * 5, jnp.float32)
    a = np.asarray(instance_norm(y))
    bb = np.asarray(instance_norm(y * s + b))
    np.testing.assert_allclose(bb, a, rtol=1e-4, atol=1e-5)


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 4)), jnp.float32)
    q, s = qg.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (4,)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(deq - np.asarray(w)).max()
    assert err <= float(np.asarray(s).max()) * 0.5 + 1e-7  # round-to-nearest


def test_int8_convt_matches_float_lowering(rng):
    """_convt_i8_k4s2p1 == core.conv_transpose2d(stride=2, padding=1) on
    integer-valued inputs (exact in int arithmetic)."""
    from multi_style_transfer_gan_tpu.core import conv_transpose2d

    x = rng.integers(-5, 6, (1, 8, 8, 4)).astype(np.float32)
    w = rng.integers(-5, 6, (4, 4, 4, 2)).astype(np.float32)
    ref = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                      stride=2, padding=1))
    out = np.asarray(qg._convt_i8_k4s2p1(jnp.asarray(x, jnp.int8),
                                         jnp.asarray(w, jnp.int8)))
    np.testing.assert_array_equal(out.astype(np.float32), ref)


def test_act_scale_fold_is_exact(rng):
    """conv(x, w) == s_w * conv_i8(round(x/s_in), round(w*s_in/s_w)) when
    x and the folded weight land exactly on the int8 grid."""
    s_in = np.asarray([0.5, 0.25, 1.0, 2.0], np.float32)
    x_int = rng.integers(-100, 101, (1, 6, 6, 4)).astype(np.float32)
    x = jnp.asarray(x_int * s_in)  # exactly representable
    w_int = rng.integers(-126, 127, (1, 1, 4, 3)).astype(np.float32)
    w_int[0, 0, 0, :] = 127  # per-out-channel absmax exactly 127 so the
    s_w_target = np.float32(0.125)  # quantizer recovers s_w_target
    w = jnp.asarray(w_int * s_w_target / s_in[:, None])  # folds back exactly

    from multi_style_transfer_gan_tpu.core import conv2d

    ref = np.asarray(conv2d(x, w), np.float32)
    scales = {"site": s_in / 1.0}
    x8 = qg.quantize_act(x, jnp.asarray(scales["site"]))
    w_eff = np.asarray(w) * s_in[None, None, :, None]
    q, s_w = qg.quantize_weight(jnp.asarray(w_eff))
    acc = np.asarray(qg._conv_i8(x8, q), np.float32)
    np.testing.assert_allclose(acc * np.asarray(s_w), ref, rtol=1e-5,
                               atol=1e-4)


@pytest.mark.slow
def test_prepare_and_forward_shapes(rng):
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=8,
                                     num_transformer_blocks=1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    qp = qg.prepare_int8_model(params, [x])
    # IN-absorbed backbone conv sites quantized; attention (qkv/proj),
    # transformer and style stay fp/bf16 (they run the fast dispatch)
    assert "initial.0" in qp["weights_q"]
    assert "up2.4.fusion.0" in qp["weights_q"]
    assert all("transformer" not in k for k in qp["weights_q"])
    assert all(not k.endswith((".qkv", ".proj")) for k in qp["weights_q"])
    assert any(k.startswith("transformer_blocks") for k in qp["fp"])
    assert "down1.3.qkv.weight" in qp["fp"]
    # dequant bias kept only where IN does not absorb it
    assert "output.0" in qp["bias"]
    assert "down1.0" not in qp["bias"]
    out = qg.quantized_enhanced_generator_apply(qp, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.slow
def test_int8_divergence_within_chaos_budget(rng):
    """Whole-forward int8-vs-fp32 divergence on the random-init network,
    bounded relative to the SAME network's bf16-vs-fp32 divergence (the
    production precision gap). Random init is the chaotic worst case —
    per-stage quant noise (~1%) compounds through attention softmaxes —
    so the budget is a multiple of the bf16 floor, not an absolute."""
    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=16,
                                     num_transformer_blocks=1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(enhanced_generator_apply(params, x), np.float32)
    floor = np.abs(ref - np.asarray(
        enhanced_generator_apply(params, x.astype(jnp.bfloat16)),
        np.float32)).mean()
    qp = qg.prepare_int8_model(params, [x])
    out = np.asarray(qg.quantized_enhanced_generator_apply(qp, x),
                     np.float32)
    d = np.abs(ref - out).mean()
    assert d < max(8.0 * floor, 0.35), (d, floor)

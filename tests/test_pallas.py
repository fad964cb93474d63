"""Pallas kernel parity tests (interpret mode on CPU)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import multi_style_transfer_gan_tpu.ops.pallas.window_attention as wa
from multi_style_transfer_gan_tpu.models.enhanced_generator import (
    local_attention_apply,
)


@pytest.fixture
def interpret_pallas(monkeypatch):
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 as wa3
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        as wag

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(wa.pl, "pallas_call", interp)
    monkeypatch.setattr(wa3.pl, "pallas_call", interp)
    monkeypatch.setattr(wag.pl, "pallas_call", interp)


@pytest.mark.parametrize("shape", [
    (2, 32, 32, 16),
    # r5 re-tier (pytest.ini budget): the C=32 variant moves to slow
    pytest.param((1, 64, 32, 32), marks=pytest.mark.slow),
])
def test_fused_window_attention_matches_reference(rng, interpret_pallas,
                                                  shape):
    B, H, W, C = shape
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    params = {
        "a.qkv.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, 3 * C)).astype(np.float32) * 0.1),
        "a.qkv.bias": jnp.asarray(
            rng.standard_normal((3 * C,)).astype(np.float32)),
        "a.proj.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, C)).astype(np.float32) * 0.1),
        "a.proj.bias": jnp.asarray(
            rng.standard_normal((C,)).astype(np.float32)),
    }
    ref = local_attention_apply(params, x, prefix="a.", window_size=4)
    got = wa.fused_window_channel_attention(
        x, params["a.qkv.weight"], params["a.qkv.bias"],
        params["a.proj.weight"], params["a.proj.bias"],
        window_size=4, tile_windows=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [
    (2, 32, 32, 16),
    # r5 re-tier: one C=16 case stays default; wider/odd variants -> slow
    pytest.param((1, 64, 64, 32), marks=pytest.mark.slow),
    pytest.param((1, 32, 64, 64), marks=pytest.mark.slow),
    pytest.param((3, 16, 16, 8), marks=pytest.mark.slow),
])
def test_grouped_window_attention_matches_reference(rng, shape):
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import grouped_window_channel_attention

    B, H, W, C = shape
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    params = {
        "a.qkv.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, 3 * C)).astype(np.float32) * 0.1),
        "a.qkv.bias": jnp.asarray(
            rng.standard_normal((3 * C,)).astype(np.float32)),
        "a.proj.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, C)).astype(np.float32) * 0.1),
        "a.proj.bias": jnp.asarray(
            rng.standard_normal((C,)).astype(np.float32)),
    }
    ref = local_attention_apply(params, x, prefix="a.", window_size=4)
    got = grouped_window_channel_attention(
        x, params["a.qkv.weight"], params["a.qkv.bias"],
        params["a.proj.weight"], params["a.proj.bias"],
        window_size=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grouped_zero_window_is_zero_safe(rng):
    # a window of exact zeros must not NaN (zero-safe normalize parity)
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import grouped_window_channel_attention

    C = 16
    x = np.asarray(rng.standard_normal((1, 8, 32, C)), np.float32)
    x[0, :4, :4] = 0.0
    xj = jnp.asarray(x)
    params = {
        "a.qkv.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, 3 * C)).astype(np.float32) * 0.1),
        "a.qkv.bias": jnp.zeros((3 * C,), jnp.float32),
        "a.proj.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, C)).astype(np.float32) * 0.1),
        "a.proj.bias": jnp.zeros((C,), jnp.float32),
    }
    ref = local_attention_apply(params, xj, prefix="a.", window_size=4)
    got = grouped_window_channel_attention(
        xj, params["a.qkv.weight"], params["a.qkv.bias"],
        params["a.proj.weight"], params["a.proj.bias"],
        window_size=4, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # whole-generator interpret-mode compile, 30s+ alone —
# the heaviest default-tier test by 3x (r5 re-tier, pytest.ini budget);
# the flag's kernel-level parity stays default-tier
# (test_window_attention_* / test_kernel_attention_matches_reference)
def test_fast_attention_flag_matches(rng, interpret_pallas):
    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=4)
    x = jnp.asarray(np.tanh(rng.standard_normal((1, 64, 64, 3))
                            ).astype(np.float32))
    a = enhanced_generator_apply(params, x)
    b = enhanced_generator_apply(params, x, fast_attention=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


@pytest.fixture
def interpret_packed_pallas(monkeypatch):
    import multi_style_transfer_gan_tpu.ops.pallas.packed_attention as pa

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pa.pl, "pallas_call", interp)


@pytest.mark.parametrize("C", [
    8,
    # r5 re-tier: the C=16 case costs ~7s alone -> slow
    pytest.param(16, marks=pytest.mark.slow),
])
def test_packed_attention_kernel_matches_reference(rng, interpret_packed_pallas, C):
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        local_attention_init,
    )
    from multi_style_transfer_gan_tpu.ops.packed import space_to_depth, depth_to_space
    from multi_style_transfer_gan_tpu.ops.pallas.packed_attention import (
        packed_window_attention_pallas,
    )

    params = local_attention_init(jax.random.PRNGKey(1), C)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, C)), jnp.float32)
    ref = local_attention_apply(params, x, prefix="")

    got = depth_to_space(packed_window_attention_pallas(
        space_to_depth(x, 4), params["qkv.weight"], params["qkv.bias"],
        params["proj.weight"], params["proj.bias"]), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [
    (2, 16, 32, 16),
    # r5 re-tier: the deployed-width case stays default
    pytest.param((1, 16, 16, 32), marks=pytest.mark.slow),
    pytest.param((4, 8, 8, 8), marks=pytest.mark.slow),
])
def test_packed_grouped_attention_matches_reference(rng, shape):
    """Packed-layout grouped-Gram entry == reference math.

    Shapes cover the adjacent-group fast relayout (Wp % g == 0) and the
    raster fallback ((4,8,8,8): g=16 > Wp=2, but R=16 windows total)."""
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        local_attention_init,
    )
    from multi_style_transfer_gan_tpu.ops.packed import (
        space_to_depth, depth_to_space,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        import packed_grouped_window_attention

    B, H, W, C = shape
    params = local_attention_init(jax.random.PRNGKey(1), C)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = local_attention_apply(params, x, prefix="")
    got = depth_to_space(packed_grouped_window_attention(
        space_to_depth(x, 4), params["qkv.weight"], params["qkv.bias"],
        params["proj.weight"], params["proj.bias"], interpret=True), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("C", [
    8, 16,
    # r5 re-tier: C=32 (the widest, slowest interpret run) -> slow
    pytest.param(32, marks=pytest.mark.slow),
])
def test_window_attention_v3_matches_reference(rng, C):
    """v3 (dense block-diagonal packed-row kernel) == reference math.

    Covers both entries: NHWC wrapper and the packed-layout entry used by
    the packed inference engine; includes all-zero positions to exercise the
    zero-safe normalize."""
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        local_attention_init,
    )
    from multi_style_transfer_gan_tpu.ops.packed import (
        space_to_depth, depth_to_space,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 import (
        packed_window_attention_v3, window_attention_v3,
    )

    params = local_attention_init(jax.random.PRNGKey(2), C)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, C)), jnp.float32)
    x = x.at[0, :4, :4, :].set(0.0)
    ref = local_attention_apply(params, x, prefix="")

    got = window_attention_v3(
        x, params["qkv.weight"], params["qkv.bias"],
        params["proj.weight"], params["proj.bias"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    got_p = depth_to_space(packed_window_attention_v3(
        space_to_depth(x, 4), params["qkv.weight"], params["qkv.bias"],
        params["proj.weight"], params["proj.bias"], interpret=True), 4)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_window_relayout_kernels_match_transpose(rng):
    """s2d_rows/d2s_rows (block-copy Pallas relayout) == the XLA 6D
    transpose they replace, across group sizes (target_rows exercises
    group 1 and >1); d2s inverts s2d exactly."""
    from multi_style_transfer_gan_tpu.ops.pallas.window_relayout import (
        d2s_rows, s2d_rows,
    )

    B, H, W, C = 2, 16, 24, 16
    ws = 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    nh, nw = H // ws, W // ws
    ref = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    ref = np.asarray(ref.reshape(B * nh * nw, ws * ws * C))
    for target in (1, 512):
        rows = s2d_rows(x, target_rows=target, interpret=True)
        np.testing.assert_array_equal(np.asarray(rows), ref)
        back = d2s_rows(rows, (B, H, W, C), target_rows=target,
                        interpret=True)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.slow
def test_window_attention_v3_fused_io_matches_reference(rng):
    """Fused-IO v3 (NHWC in/out, relayouts in-VMEM) == reference math,
    including the zero-safe normalize and multi-grid-step runs."""
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        local_attention_init,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_relayout import (
        window_attention_v3_fused_io,
    )

    C = 16
    params = local_attention_init(jax.random.PRNGKey(2), C)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, C)), jnp.float32)
    x = x.at[0, :4, :4, :].set(0.0)
    ref = local_attention_apply(params, x, prefix="")
    for target in (4, 512):  # 4 -> multiple grid steps at this shape
        got = window_attention_v3_fused_io(
            x, params["qkv.weight"], params["qkv.bias"],
            params["proj.weight"], params["proj.bias"],
            target_rows=target, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # both variants: heavy fused fwd compile (r5 re-tier,
# pytest.ini budget — the 32-dim variant alone measured >10s idle-host)
@pytest.mark.parametrize("dim,hw", [
    (64, (16, 24)),  # deployed dim
    (32, (8, 8)),
])
def test_fused_structural_block_matches_reference(rng, dim, hw):
    """Fused Pallas block body == structural_transformer_apply (fp32)."""
    from multi_style_transfer_gan_tpu.models.structural_transformer import (
        structural_transformer_apply, structural_transformer_init,
    )

    H, W = hw
    B = 2
    params = structural_transformer_init(jax.random.PRNGKey(3), dim)
    # non-zero style modulation so the FiLM path is exercised
    params["style_mod.weight"] = jnp.asarray(
        rng.standard_normal(params["style_mod.weight"].shape), jnp.float32) * 0.1
    params["style_mod.bias"] = jnp.asarray(
        rng.standard_normal(params["style_mod.bias"].shape), jnp.float32) * 0.1

    tokens = jnp.asarray(rng.standard_normal((B, H * W, dim)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((B, dim)), jnp.float32)
    orig = jnp.asarray(rng.standard_normal((B, 4 * H, 4 * W, 3)), jnp.float32)

    ref = structural_transformer_apply(params, tokens, style, orig, (H, W))

    import multi_style_transfer_gan_tpu.ops.pallas.fused_transformer as ft
    orig_call = ft.pl.pallas_call
    ft.pl.pallas_call = lambda *a, **kw: orig_call(*a, **{**kw,
                                                          "interpret": True})
    try:
        got = structural_transformer_apply(params, tokens, style, orig,
                                           (H, W), fast=True)
    finally:
        ft.pl.pallas_call = orig_call
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("C,shape", [(16, (2, 32, 32)), (32, (1, 64, 32)),
                                     (64, (1, 32, 32))])
def test_window_attention_v4_matches_reference(rng, C, shape):
    """v4 (chunk-looped per-window kernel) == reference math, including the
    in-kernel fori_loop over dynamic VMEM offsets (num_chunks > 1)."""
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        local_attention_init,
    )
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_v4 import (
        window_attention_v4,
    )

    B, H, W = shape
    params = local_attention_init(jax.random.PRNGKey(5), C)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    x = x.at[0, :4, :4, :].set(0.0)  # zero-safe normalize coverage
    ref = local_attention_apply(params, x, prefix="")
    got = window_attention_v4(
        x, params["qkv.weight"], params["qkv.bias"],
        params["proj.weight"], params["proj.bias"],
        chunk_windows=16, num_chunks=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fast_attention_train_vjp_matches_xla_grads(rng, monkeypatch):
    """fast="train" (fused kernels fwd + XLA custom_vjp bwd) produces the
    XLA path's gradients at the unit level (sum-loss: the cotangent is
    independent of the primal, so the custom bwd — the XLA vjp on saved
    inputs — must match exactly up to fp noise). Full-network gradient
    comparison is deliberately NOT tested: tiny forward deltas amplify
    chaotically through the instance-norm stages (see PERFORMANCE.md)."""
    import multi_style_transfer_gan_tpu.ops.pallas.fused_transformer as ft
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention as wa
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_train \
        as wat
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 as wa3
    import multi_style_transfer_gan_tpu.ops.pallas.window_mhsa_train as wmt
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        local_attention_init,
    )
    from multi_style_transfer_gan_tpu.models.structural_transformer import (
        structural_transformer_apply, structural_transformer_init,
    )

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    for mod in (wa, wa3, ft, wat, wmt):
        monkeypatch.setattr(mod.pl, "pallas_call", interp)

    # windowed channel attention (covers both kernel dispatches)
    for C in (16, 32):
        params = local_attention_init(jax.random.PRNGKey(6), C)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, C)), jnp.float32)

        def loss(params, x, fast):
            return jnp.sum(local_attention_apply(params, x, prefix="",
                                                 fast=fast))

        gf = jax.grad(loss, argnums=(0, 1))(params, x, "train")
        gx = jax.grad(loss, argnums=(0, 1))(params, x, False)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    # structural transformer block
    dim, H, W = 32, 8, 8
    params = structural_transformer_init(jax.random.PRNGKey(7), dim)
    tokens = jnp.asarray(rng.standard_normal((1, H * W, dim)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((1, dim)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((1, 4 * H, 4 * W, 3)), jnp.float32)

    def tloss(params, tokens, fast):
        return jnp.sum(structural_transformer_apply(params, tokens, style,
                                                    im, (H, W), fast=fast))

    gf = jax.grad(tloss, argnums=(0, 1))(params, tokens, "train")
    gx = jax.grad(tloss, argnums=(0, 1))(params, tokens, False)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# hand-written backward kernels (window_attention_train)
# ---------------------------------------------------------------------------

def _attn_params(rng, C):
    return {
        "qkv.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, 3 * C)).astype(np.float32) * 0.1),
        "qkv.bias": jnp.asarray(
            rng.standard_normal((3 * C,)).astype(np.float32)),
        "proj.weight": jnp.asarray(
            rng.standard_normal((1, 1, C, C)).astype(np.float32) * 0.1),
        "proj.bias": jnp.asarray(
            rng.standard_normal((C,)).astype(np.float32)),
    }


# (2,32,32,16): nw=8 % g=8 == 0 fast relayout; (1,16,48,32): nw=12 % g=4;
# (2,16,12,16): nw=3 % g=8 != 0 exercises the general relayout branch.
# Default tier keeps one C=16 branch (the ragged general-relayout shape);
# the square C=16 fast-relayout and the C=32/C=64 width variants run in
# the slow tier (suite-budget policy, pytest.ini).
@pytest.mark.parametrize("shape", [
    pytest.param((2, 32, 32, 16), marks=pytest.mark.slow),
    pytest.param((1, 16, 48, 32), marks=pytest.mark.slow),
    (2, 16, 12, 16),
    pytest.param((1, 16, 16, 64), marks=pytest.mark.slow),
])
def test_train_kernel_forward_and_grads_match_xla(rng, shape):
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_train \
        import supports_train_kernel, window_channel_attention_train
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        _attention_math,
    )

    B, H, W, C = shape
    assert supports_train_kernel(B, H, W, C)
    p = _attn_params(rng, C)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    args = (x, p["qkv.weight"], p["qkv.bias"], p["proj.weight"],
            p["proj.bias"])

    ref = _attention_math(*args, window_size=4, eps=1e-12)
    got = window_channel_attention_train(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradient parity vs the XLA formulation, all five inputs; a quadratic
    # loss so the cotangent depends on the primal too
    loss_k = lambda *a: jnp.sum(
        window_channel_attention_train(*a, interpret=True) ** 2)
    loss_x = lambda *a: jnp.sum(
        _attention_math(*a, window_size=4, eps=1e-12) ** 2)
    gk = jax.grad(loss_k, argnums=tuple(range(5)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(5)))(*args)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # r5 re-tier: zero-window edge case (~6s); the main
# train-kernel fwd/grads parity stays default-tier
def test_train_kernel_zero_window_grads_finite(rng):
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_train \
        import window_channel_attention_train
    from multi_style_transfer_gan_tpu.models.enhanced_generator import (
        _attention_math,
    )

    C = 16
    x = np.asarray(rng.standard_normal((1, 8, 32, C)), np.float32)
    x[0, :4, :4] = 0.0
    p = _attn_params(rng, C)
    p["qkv.bias"] = jnp.zeros((3 * C,), jnp.float32)  # keep q/k exactly 0
    args = (jnp.asarray(x), p["qkv.weight"], p["qkv.bias"],
            p["proj.weight"], p["proj.bias"])

    loss_k = lambda *a: jnp.sum(
        window_channel_attention_train(*a, interpret=True) ** 2)
    loss_x = lambda *a: jnp.sum(
        _attention_math(*a, window_size=4, eps=1e-12) ** 2)
    gk = jax.grad(loss_k, argnums=tuple(range(5)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(5)))(*args)
    for a, b in zip(gk, gx):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_train_kernel_support_predicate():
    from multi_style_transfer_gan_tpu.ops.pallas.window_attention_train \
        import supports_train_kernel

    assert supports_train_kernel(8, 128, 128, 16)     # flagship train shape
    assert not supports_train_kernel(1, 16, 16, 48)   # 128 % 48 != 0
    assert not supports_train_kernel(1, 16, 16, 128)  # C > 64
    assert not supports_train_kernel(1, 18, 16, 16)   # H % ws != 0
    assert not supports_train_kernel(1, 4, 4, 64)     # R=1 not divisible by g


# ---------------------------------------------------------------------------
# measured dispatch (attention_dispatch)
# ---------------------------------------------------------------------------

def test_dispatch_static_defaults_match_round1_table():
    from multi_style_transfer_gan_tpu.ops.pallas.attention_dispatch import (
        valid_impls,
    )

    # grouped wherever the group geometry holds (C<=32, 128%C==0)
    assert valid_impls(128, 256, 256, 32, 4)[0] == "grouped"
    assert valid_impls(128, 512, 512, 16, 4)[0] == "grouped"
    # C<=16 without group divisibility -> v3
    assert valid_impls(1, 12, 12, 16, 4)[0] == "v3"
    # C=32 without group divisibility at a big grid -> XLA einsum
    assert valid_impls(1, 260, 260, 32, 4)[0] == "einsum"
    # C=64 -> per-window v1 kernel
    assert valid_impls(128, 128, 128, 64, 4)[0] == "v1"
    # every list ends with a universal fallback and has no duplicates
    for shape in [(128, 256, 256, 32), (1, 12, 12, 16), (2, 64, 64, 64)]:
        names = valid_impls(*shape, 4)
        assert "einsum" in names and len(names) == len(set(names))


def test_dispatch_probe_caches_winner(rng, monkeypatch, tmp_path):
    import multi_style_transfer_gan_tpu.ops.pallas.attention_dispatch as ad
    import multi_style_transfer_gan_tpu.ops.pallas.fused_transformer as ft
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention as wa
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        as wag
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 as wa3

    for mod in (wa, wa3, wag, ft):
        orig = mod.pl.pallas_call

        def interp(*a, _orig=orig, **kw):
            kw["interpret"] = True
            return _orig(*a, **kw)

        monkeypatch.setattr(mod.pl, "pallas_call", interp)

    cache = tmp_path / "dispatch.json"
    monkeypatch.setenv("MSTGAN_DISPATCH_CACHE", str(cache))
    monkeypatch.setattr(ad, "_mem", None)  # drop any loaded table

    B, H, W, C = 2, 16, 16, 16
    winner = ad.probe(B, H, W, C, 4, jnp.float32, rounds=1, iters=1)
    assert winner in ad.valid_impls(B, H, W, C, 4)
    saved = json.loads(cache.read_text())
    [(key, entry)] = saved.items()
    assert entry["impl"] == winner and key.endswith("2x16x16x16:ws4:float32")
    # pick() must return the measured winner, not the static default
    assert ad.pick(B, H, W, C, 4, jnp.float32) == winner
    # ...including in a fresh process (cache reloaded from disk)
    monkeypatch.setattr(ad, "_mem", None)
    assert ad.pick(B, H, W, C, 4, jnp.float32) == winner
    # unknown shapes still fall back to the static table instantly
    assert ad.pick(4, 32, 32, 32, 4, jnp.float32) == "grouped"


def test_dispatch_shipped_table_used_on_fresh_tpu_machine(monkeypatch,
                                                          tmp_path):
    """VERDICT round-2 item 5: a fresh machine with NO per-machine cache must
    dispatch the quiet-chip winners shipped in tuned_dispatch.json — v3 at
    the C=16 big grids (where the static rules say grouped), grouped at
    C=32, v1 at C=64 — for any batch size, on tpu-class backends."""
    import jax as _jax

    import multi_style_transfer_gan_tpu.ops.pallas.attention_dispatch as ad

    monkeypatch.setenv("MSTGAN_DISPATCH_CACHE",
                       str(tmp_path / "missing.json"))
    monkeypatch.delenv("MSTGAN_AUTOTUNE", raising=False)
    monkeypatch.setattr(ad, "_mem", None)   # no per-machine cache
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")

    bf16 = jnp.bfloat16
    # the six deployed stage shapes, at batches the tuner never saw
    for B in (16, 96, 128):
        assert ad.pick(B, 512, 512, 16, 4, bf16) == "v3"     # up2 @512-in
        assert ad.pick(B, 256, 256, 32, 4, bf16) == "grouped"  # down1/up1
        assert ad.pick(B, 128, 128, 64, 4, bf16) == "v1"     # down2
        assert ad.pick(B, 256, 256, 16, 4, bf16) == "v3"     # up2 @256-in
        assert ad.pick(B, 128, 128, 32, 4, bf16) == "grouped"
        assert ad.pick(B, 64, 64, 64, 4, bf16) == "v1"
    # unknown shapes keep the static fallback
    assert ad.pick(4, 32, 32, 32, 4, bf16) == "grouped"
    # non-tpu backends ignore the shipped v5e measurements
    monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
    assert ad.pick(96, 512, 512, 16, 4, bf16) == "grouped"
    # a per-machine cache entry still outranks the shipped table
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    ad._load()[ad._key(96, 512, 512, 16, 4, bf16)] = "grouped"
    assert ad.pick(96, 512, 512, 16, 4, bf16) == "grouped"
    monkeypatch.setattr(ad, "_mem", None)


# ---------------------------------------------------------------------------
# hand-written backward for the windowed MHSA mid (window_mhsa_train)
# ---------------------------------------------------------------------------

def _mhsa_mid_reference(qkv, window, heads):
    """The XLA formulation of the mid (structural_transformer.
    _window_attention minus the qkv/proj matmuls), used as parity oracle."""
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    nh, nw = H // window, W // window
    x = qkv.reshape(B, nh, window, nw, window, 3 * C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, 3 * C)
    q, k, v = jnp.split(x, 3, axis=-1)
    sh = lambda t: t.reshape(t.shape[0], -1, heads, hd).transpose(0, 2, 1, 3)
    q, k, v = sh(q), sh(k), sh(v)
    attn = jnp.einsum("bhtd,bhsd->bhts", q, k,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v,
                     preferred_element_type=jnp.float32).astype(qkv.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(-1, window * window, C)
    out = out.reshape(B, nh, nw, window, window, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


@pytest.mark.parametrize("shape,heads", [
    ((2, 16, 16, 48), 1),
    pytest.param((1, 8, 24, 192), 2, marks=pytest.mark.slow),
    pytest.param((1, 16, 8, 96), 1, marks=pytest.mark.slow),
])
def test_mhsa_train_kernel_forward_and_grads_match_xla(rng, shape, heads):
    from multi_style_transfer_gan_tpu.ops.pallas.window_mhsa_train import (
        window_mhsa_train,
    )

    qkv = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = _mhsa_mid_reference(qkv, 8, heads)
    got = window_mhsa_train(qkv, 8, heads, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradient parity with a quadratic loss (cotangent depends on primal)
    gk = jax.grad(lambda a: jnp.sum(window_mhsa_train(a, 8, heads, True)
                                    ** 2))(qkv)
    gx = jax.grad(lambda a: jnp.sum(_mhsa_mid_reference(a, 8, heads)
                                    ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-4, atol=2e-4)


def test_mhsa_train_kernel_bf16_grads_finite(rng):
    from multi_style_transfer_gan_tpu.ops.pallas.window_mhsa_train import (
        window_mhsa_train,
    )

    qkv = jnp.asarray(rng.standard_normal((1, 8, 8, 96)), jnp.bfloat16)
    g = jax.grad(lambda a: jnp.sum(window_mhsa_train(a, 8, 1, True)
                                   .astype(jnp.float32)))(qkv)
    assert np.isfinite(np.asarray(g, np.float32)).all()

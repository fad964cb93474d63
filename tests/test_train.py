"""Training-step tests: correctness of the loss recipe and multi-device
execution on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_style_transfer_gan_tpu.train import (
    cyclegan_init_state, cyclegan_train_step, save_models,
    pretrain_init_state, pretrain_train_step,
)
from multi_style_transfer_gan_tpu.train.cyclegan import make_optimizers
from multi_style_transfer_gan_tpu.parallel import (
    make_mesh, shard_batch, replicate_tree,
)
from multi_style_transfer_gan_tpu.data import random_patch_mask


def test_pretrain_step_learns(rng):
    key = jax.random.PRNGKey(0)
    state, tx = pretrain_init_state(key, channels=8, num_epochs=10,
                                    steps_per_epoch=5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    x = jnp.tanh(x)
    step = jax.jit(lambda s, imgs, k: pretrain_train_step(s, tx, imgs, k))
    losses = []
    for i in range(8):
        # fixed mask key: deterministic objective so the decrease is clean
        state, loss = step(state, x, jax.random.PRNGKey(7))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_mask_law():
    mask = random_patch_mask(jax.random.PRNGKey(0), 64, 256)
    assert mask.shape == (64, 256, 256, 1)
    # patch-constant: every 32x32 cell is constant
    cells = mask.reshape(64, 8, 32, 8, 32)
    assert bool(jnp.all(cells.std(axis=(2, 4)) == 0))
    drop_rate = float(1 - mask.mean())
    assert 0.3 < drop_rate < 0.5  # p=0.4 law


def test_cyclegan_step_runs_and_updates(rng):
    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4)
    g_tx, d_tx = make_optimizers()
    xa = jnp.asarray(np.tanh(rng.standard_normal((1, 64, 64, 3))).astype(np.float32))
    xb = jnp.asarray(np.tanh(rng.standard_normal((1, 64, 64, 3))).astype(np.float32))
    step = jax.jit(lambda s, a, b: cyclegan_train_step(s, a, b, g_tx, d_tx))
    new_state, losses = step(state, xa, xb)
    for k in ("d_loss", "g_loss", "cycle_loss", "identity_loss",
              "structure_loss"):
        assert np.isfinite(float(losses[k])), k
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.g_params, new_state.g_params)
    assert max(jax.tree.leaves(moved)) > 0
    # sn state iterated
    u0 = state.sn_state["D_A"]["main.0"]["u"]
    u1 = new_state.sn_state["D_A"]["main.0"]["u"]
    assert float(jnp.max(jnp.abs(u0 - u1))) > 0


def test_cyclegan_step_data_parallel_8dev(rng):
    """Full train step on an 8-device mesh with the batch sharded over
    'data' — validates the multi-chip path without TPU hardware."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4)
    state = replicate_tree(state, mesh)
    g_tx, d_tx = make_optimizers()
    xa = np.tanh(rng.standard_normal((8, 64, 64, 3))).astype(np.float32)
    xb = np.tanh(rng.standard_normal((8, 64, 64, 3))).astype(np.float32)
    xa, xb = shard_batch((xa, xb), mesh)
    step = jax.jit(lambda s, a, b: cyclegan_train_step(s, a, b, g_tx, d_tx))
    new_state, losses = step(state, xa, xb)
    assert np.isfinite(float(losses["d_loss"]))
    # replicated params stay replicated after the update
    leaf = new_state.g_params["G_AB"]["initial.0.weight"]
    assert leaf.sharding.is_fully_replicated


def test_save_models_torch_loadable(rng, tmp_path):
    import torch

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4)
    save_models(state, tmp_path, epoch=20)
    ck = torch.load(tmp_path / "G_AB_epoch_20.pth", map_location="cpu",
                    weights_only=False)
    assert ck["epoch"] == 20
    assert "initial.0.weight" in ck["G_AB_state_dict"]
    assert tuple(ck["G_AB_state_dict"]["initial.0.weight"].shape) == (4, 3, 7, 7)
    dk = torch.load(tmp_path / "discriminators_epoch_20.pth",
                    map_location="cpu", weights_only=False)
    assert "main.0.weight_orig" in dk["D_A_state_dict"]
    assert "main.0.weight_u" in dk["D_A_state_dict"]


def test_remat_gradients_match():
    """jax.checkpoint (gradient checkpointing parity with the reference's
    gradient_checkpointing_enable) must not change values or gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_style_transfer_gan_tpu.models import (
        enhanced_generator_apply, enhanced_generator_init,
    )

    params = enhanced_generator_init(jax.random.PRNGKey(0), channels=4,
                                     num_transformer_blocks=1)
    x = jnp.asarray(np.tanh(np.random.default_rng(0)
                            .standard_normal((1, 32, 32, 3))), jnp.float32)

    def loss(p, remat):
        return jnp.mean(jnp.square(enhanced_generator_apply(p, x,
                                                            remat=remat)))

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_bf16_train_step_runs():
    """Mixed-precision (bf16 compute) CycleGAN step — the torch-AMP
    replacement — must differentiate through all convs (regression: conv
    kernel-gradient transpose requires matching operand dtypes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_style_transfer_gan_tpu.train import (
        cyclegan_init_state, cyclegan_train_step,
    )
    from multi_style_transfer_gan_tpu.train.cyclegan import make_optimizers

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4,
                                num_transformer_blocks=1)
    g_tx, d_tx = make_optimizers()
    x = jnp.asarray(np.tanh(np.random.default_rng(0)
                            .standard_normal((1, 32, 32, 3))), jnp.float32)
    state, losses = jax.jit(lambda s, a, b: cyclegan_train_step(
        s, a, b, g_tx, d_tx, compute_dtype=jnp.bfloat16))(state, x, x)
    assert all(np.isfinite(float(v)) for v in losses.values())

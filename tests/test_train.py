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


@pytest.mark.slow  # enhanced fwd+bwd compile; suite-budget policy
def test_enhanced_pretrain_step_learns_and_warm_starts(rng, tmp_path):
    """model='enhanced' pretraining: loss decreases, the checkpoint is
    torch-schema, and cyclegan_init_state warm-starts from it with EVERY
    generator tensor transferred (the reference's plain->enhanced warm
    start transfers zero — this is the working version of
    enhanced_train.py:28-33)."""
    from multi_style_transfer_gan_tpu.train import save_pretrain_checkpoint
    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state,
    )
    from multi_style_transfer_gan_tpu.weights import (
        enhanced_generator_from_sd, extract_state_dict, load_pth,
    )

    key = jax.random.PRNGKey(0)
    state, tx = pretrain_init_state(key, channels=4, num_epochs=10,
                                    steps_per_epoch=5, model="enhanced")
    x = jnp.tanh(jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32)))
    step = jax.jit(lambda s, imgs, k: pretrain_train_step(s, tx, imgs, k))
    losses = []
    for _ in range(4):
        state, loss = step(state, x, jax.random.PRNGKey(7))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    path = tmp_path / "generator_pretrain_epoch_1.pth"
    save_pretrain_checkpoint(state, path, 1, losses[-1])
    pre = enhanced_generator_from_sd(extract_state_dict(load_pth(path)))
    cg = cyclegan_init_state(jax.random.PRNGKey(1), channels=4,
                             pretrained_params=pre)
    for g in ("G_AB", "G_BA"):
        for k, v in pre.items():
            np.testing.assert_array_equal(np.asarray(cg.g_params[g][k]),
                                          np.asarray(v))


def test_mask_law():
    mask = random_patch_mask(jax.random.PRNGKey(0), 64, 256)
    assert mask.shape == (64, 256, 256, 1)
    # patch-constant: every 32x32 cell is constant
    cells = mask.reshape(64, 8, 32, 8, 32)
    assert bool(jnp.all(cells.std(axis=(2, 4)) == 0))
    drop_rate = float(1 - mask.mean())
    assert 0.3 < drop_rate < 0.5  # p=0.4 law


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_pretrain_checkpoint_torch_loadable(tmp_path):
    """The exported .pth must satisfy the reference's resume path
    (pretrain_resume.py:134-157): strict model load + torch Adam
    load_state_dict."""
    import torch

    from multi_style_transfer_gan_tpu.train.pretrain import (
        pretrain_init_state, pretrain_train_step, save_pretrain_checkpoint,
    )

    state, tx = pretrain_init_state(jax.random.PRNGKey(0), channels=4,
                                    num_epochs=4, steps_per_epoch=2)
    x = jnp.asarray(np.tanh(np.random.default_rng(0)
                            .standard_normal((2, 32, 32, 3))), jnp.float32)
    state, _ = pretrain_train_step(state, tx, x, jax.random.PRNGKey(1))
    path = tmp_path / "pre.pth"
    save_pretrain_checkpoint(state, str(path), epoch=0)
    ck = torch.load(path, map_location="cpu", weights_only=True)

    sd = ck["model_state_dict"]
    assert any(k.endswith("num_batches_tracked") for k in sd)
    # a real torch Adam accepts the optimizer state
    params = [torch.nn.Parameter(sd[k].clone().float())
              for k in sd if not k.endswith(("running_mean", "running_var",
                                             "num_batches_tracked"))]
    opt = torch.optim.Adam(params, lr=2e-4, betas=(0.5, 0.999))
    opt.load_state_dict(ck["optimizer_state_dict"])
    st = opt.state[params[0]]
    assert st["exp_avg"].shape == params[0].shape
    assert float(st["step"]) == 1.0


@pytest.mark.slow
def test_pretrain_resume_fast_forwards_schedule(tmp_path):
    """restore_opt_state must resume the cosine schedule at the saved step
    (the reference restores the torch scheduler) and restore adam moments."""
    from multi_style_transfer_gan_tpu.train.pretrain import (
        pretrain_init_state, pretrain_train_step, restore_opt_state,
        save_pretrain_checkpoint,
    )
    from multi_style_transfer_gan_tpu.weights import load_pth

    state, tx = pretrain_init_state(jax.random.PRNGKey(0), channels=4,
                                    num_epochs=4, steps_per_epoch=1)
    x = jnp.asarray(np.tanh(np.random.default_rng(0)
                            .standard_normal((2, 32, 32, 3))), jnp.float32)
    for i in range(2):
        state, _ = pretrain_train_step(state, tx, x,
                                       jax.random.PRNGKey(i))
    path = tmp_path / "pre.pth"
    save_pretrain_checkpoint(state, str(path), epoch=1)

    ck = load_pth(str(path))
    opt = restore_opt_state(tx, state.params, 2,
                            ck.get("optimizer_state_dict"))

    counts, moments = [], []
    def walk(s):
        if hasattr(s, "_fields"):
            if "count" in s._fields:
                counts.append(int(s.count))
            if "mu" in s._fields:
                moments.append(s.mu)
            for v in s:
                walk(v)
        elif isinstance(s, tuple):
            for v in s:
                walk(v)
    walk(opt)
    assert counts and all(c == 2 for c in counts)
    # restored first-moment matches the live optimizer's
    def adam_mu(o):
        got = []
        def g(s):
            if hasattr(s, "_fields"):
                if "mu" in s._fields:
                    got.append(s.mu)
                for v in s:
                    g(v)
            elif isinstance(s, tuple):
                for v in s:
                    g(v)
        g(o)
        return got[0]
    live = adam_mu(state.opt)
    rest = adam_mu(opt)
    for k in live:
        np.testing.assert_allclose(np.asarray(rest[k]), np.asarray(live[k]),
                                   atol=1e-6)


def test_random_patch_mask_rectangular():
    from multi_style_transfer_gan_tpu.data import random_patch_mask

    m = random_patch_mask(jax.random.PRNGKey(0), 2, 64, width=128)
    assert m.shape == (2, 64, 128, 1)
    with pytest.raises(ValueError, match="divisible"):
        random_patch_mask(jax.random.PRNGKey(0), 2, 60)


def test_save_models_always_exports_weight_v(tmp_path):
    """Even before any power iteration (v=None) the discriminators .pth
    must carry weight_v so torch spectral_norm strict-loads."""
    import torch

    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state, save_models,
    )

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4,
                                num_transformer_blocks=1)
    save_models(state, str(tmp_path), epoch=1)
    ck = torch.load(tmp_path / "discriminators_epoch_1.pth",
                    map_location="cpu", weights_only=True)
    for name in ("D_A_state_dict", "D_B_state_dict"):
        sd = ck[name]
        us = {k[:-len(".weight_u")] for k in sd if k.endswith(".weight_u")}
        vs = {k[:-len(".weight_v")] for k in sd if k.endswith(".weight_v")}
        assert us and us == vs


@pytest.mark.slow
def test_extra_g_loss_hook_runs():
    """The documented perceptual hook wires into the train step and
    contributes gradients (total loss grows, step still finite)."""
    import sys
    sys.path.insert(0, "tests")
    from feature_oracle import make_vgg16_sd

    from multi_style_transfer_gan_tpu.train.cyclegan import (
        cyclegan_init_state, cyclegan_train_step, make_optimizers,
    )
    from multi_style_transfer_gan_tpu.train.perceptual import (
        make_extra_g_loss, vgg16_from_torchvision_sd,
    )

    vgg = vgg16_from_torchvision_sd(make_vgg16_sd(np.random.default_rng(2)))
    hook = make_extra_g_loss(vgg, w_perceptual=1.0, w_gram=1.0)
    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4,
                                num_transformer_blocks=1)
    g_tx, d_tx = make_optimizers()
    x = jnp.asarray(np.tanh(np.random.default_rng(0)
                            .standard_normal((1, 32, 32, 3))), jnp.float32)
    state, losses = jax.jit(lambda s, a, b: cyclegan_train_step(
        s, a, b, g_tx, d_tx, extra_g_loss=hook, remat=False))(state, x, x)
    assert all(np.isfinite(float(v)) for v in losses.values())


@pytest.mark.slow
def test_fast_attention_train_step_matches_xla_losses(rng, monkeypatch):
    """One full CycleGAN step with fast_attention=True (the hand-written
    backward kernels, interpreted) produces the same losses and nearly the
    same parameter update as the pure-XLA step."""
    from jax.experimental import pallas as pl

    import multi_style_transfer_gan_tpu.ops.pallas.fused_transformer as ft
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention as wa
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_grouped \
        as wag
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_train \
        as wat
    import multi_style_transfer_gan_tpu.ops.pallas.window_attention_v3 as wa3
    import multi_style_transfer_gan_tpu.ops.pallas.window_mhsa_train as wmt

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    for mod in (wa, wa3, wag, wat, ft, wmt):
        monkeypatch.setattr(mod.pl, "pallas_call", interp)

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4)
    g_tx, d_tx = make_optimizers()
    xa = jnp.asarray(np.tanh(rng.standard_normal((2, 64, 64, 3))),
                     jnp.float32)
    xb = jnp.asarray(np.tanh(rng.standard_normal((2, 64, 64, 3))),
                     jnp.float32)

    _, l_fast = jax.jit(lambda s, a, b: cyclegan_train_step(
        s, a, b, g_tx, d_tx, fast_attention=True))(state, xa, xb)
    _, l_xla = jax.jit(lambda s, a, b: cyclegan_train_step(
        s, a, b, g_tx, d_tx, fast_attention=False))(state, xa, xb)
    for k in l_xla:
        np.testing.assert_allclose(float(l_fast[k]), float(l_xla[k]),
                                   rtol=2e-4, atol=2e-4)


def test_lr_decay_schedule_semantics():
    """--lr_decay (CycleGAN-paper schedule, cli/train.py): constant LR
    through the first half of training, linear to zero at the end. With a
    constant unit gradient adam's bias-corrected update magnitude is ~lr
    exactly, so the realized step sizes trace the schedule."""
    N = 10
    g_tx, _ = make_optimizers(decay_steps=N)
    params = {"w": jnp.zeros((1,), jnp.float32)}
    opt = g_tx.init(params)
    grads = {"w": jnp.ones((1,), jnp.float32)}
    lrs = []
    for _ in range(N):
        updates, opt = g_tx.update(grads, opt, params)
        lrs.append(-float(updates["w"][0]))
    from multi_style_transfer_gan_tpu.train.cyclegan import G_LR
    # first half: the reference's constant lr
    for lr in lrs[: N // 2]:
        assert abs(lr - G_LR) < 1e-9, lrs
    # second half: strictly decreasing, reaching ~0 on the final step
    second = lrs[N // 2:]
    assert all(a > b for a, b in zip(second, second[1:])), lrs
    assert second[-1] < G_LR * 0.25, lrs
    # default (no decay_steps) stays constant — the reference recipe
    g_tx0, _ = make_optimizers()
    opt0 = g_tx0.init(params)
    for _ in range(3):
        updates, opt0 = g_tx0.update(grads, opt0, params)
        assert abs(-float(updates["w"][0]) - G_LR) < 1e-9


def test_lr_decay_state_tree_matches_loop_optimizer():
    """cyclegan_init_state(txs=...) must build its optimizer state from the
    SAME pair the loop steps with: a scheduled adam carries injected
    hyperparam/count state absent from the plain adam tree (the exact
    mismatch the --lr_decay wiring fixed)."""
    txs = make_optimizers(decay_steps=100)
    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4, txs=txs)
    want = jax.tree_util.tree_structure(txs[0].init(state.g_params))
    got = jax.tree_util.tree_structure(state.g_opt)
    assert want == got


def test_image_pool_law():
    """train/pool.py replay buffer: fill phase passes fakes through while
    inserting them; full phase conserves the multiset (every step either
    passes the fake through untouched or swaps it with a history entry) and
    mixes history into the D batch at ~p=0.5."""
    from multi_style_transfer_gan_tpu.train import pool_init, pool_sample

    P, H = 4, 8

    def batch(vals):
        return jnp.stack([jnp.full((H, H, 3), v, jnp.float32) for v in vals])

    pool = pool_init(P, H)
    first = batch([1.0, 2.0, 3.0, 4.0])
    pool, out = jax.jit(pool_sample)(pool, first, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(first))
    np.testing.assert_array_equal(np.asarray(pool.images), np.asarray(first))
    assert int(pool.n) == P

    # full phase: conservation — {new pool entries} + {outs} is exactly
    # {old pool entries} + {new fakes} as multisets (constant images make
    # the per-image mean an exact id)
    second = batch([5.0, 6.0, 7.0, 8.0])
    pool2, out2 = jax.jit(pool_sample)(pool, second, jax.random.PRNGKey(1))
    ids = lambda x: sorted(np.asarray(x).mean(axis=(1, 2, 3)).tolist())
    assert ids(jnp.concatenate([pool2.images, out2])) == ids(
        jnp.concatenate([pool.images, second]))
    assert int(pool2.n) == P

    # over many full-phase steps, ~half the emitted images are history
    pool_m = pool_init(P, H)
    pool_m, _ = pool_sample(pool_m, first, jax.random.PRNGKey(2))
    hist = 0
    total = 0
    v = 10.0
    sample = jax.jit(pool_sample)
    for i in range(50):
        fakes = batch([v, v + 1, v + 2, v + 3])
        pool_m, out = sample(pool_m, fakes, jax.random.PRNGKey(100 + i))
        got = np.asarray(out).mean(axis=(1, 2, 3))
        sent = np.asarray(fakes).mean(axis=(1, 2, 3))
        hist += int((got != sent).sum())
        total += len(sent)
        v += 4
    assert 0.3 < hist / total < 0.7, hist / total


@pytest.mark.slow
def test_pool_and_lr_decay_mesh_parity(rng):
    """pool.py's docstring claims the replicated-pool update "stays
    identical on every shard"; this makes that a theorem (VERDICT r4 item
    4): the SAME batches through (a) a single device and (b) the 8-device
    data-parallel mesh, with pools threaded AND the --lr_decay scheduled
    optimizer, for 2 steps — every per-step loss and the final pool
    contents (buffers, fill counts, key) must agree to fp-reassociation
    tolerance.

    Why 2 steps and 2e-4: the adversarial dynamics amplify the per-step
    ~1e-6 dp-psum reassociation noise chaotically (~x50/step measured,
    WITH OR WITHOUT pools — step 2: 3.2e-5 no-pool vs 2.6e-5 pool; step 3
    blows to 5e-2 in BOTH configurations), so a longer horizon tests
    chaos, not sharding. Anything structural (wrong collective, diverged
    pool law) shows up at step 0-1, orders of magnitude above 2e-4."""
    from multi_style_transfer_gan_tpu.train import pool_init

    g_tx, d_tx = make_optimizers(decay_steps=3)  # decay active by step 2

    def fresh():
        state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4,
                                    txs=(g_tx, d_tx))
        pools = ((pool_init(5, 64), pool_init(5, 64)),
                 jax.random.PRNGKey(9))
        return state, pools

    xa = [np.tanh(rng.standard_normal((8, 64, 64, 3))).astype(np.float32)
          for _ in range(2)]
    xb = [np.tanh(rng.standard_normal((8, 64, 64, 3))).astype(np.float32)
          for _ in range(2)]
    step = jax.jit(lambda s, p, a, b: cyclegan_train_step(
        s, a, b, g_tx, d_tx, pools=p))

    s1, p1 = fresh()
    single = []
    for a, b in zip(xa, xb):
        s1, l1, p1 = step(s1, p1, jnp.asarray(a), jnp.asarray(b))
        single.append({k: float(v) for k, v in l1.items()})

    mesh = make_mesh()
    s8, p8 = fresh()
    s8 = replicate_tree(s8, mesh)
    p8 = replicate_tree(p8, mesh)
    sharded = []
    for a, b in zip(xa, xb):
        a8, b8 = shard_batch((a, b), mesh)
        s8, l8, p8 = step(s8, p8, a8, b8)
        sharded.append({k: float(v) for k, v in l8.items()})

    for i, (l1, l8) in enumerate(zip(single, sharded)):
        for k in l1:
            rel = abs(l1[k] - l8[k]) / max(abs(l1[k]), 1e-8)
            assert rel <= 2e-4, (i, k, l1[k], l8[k])
    (pa1, pb1), key1 = p1
    (pa8, pb8), key8 = p8
    for single_pool, mesh_pool in ((pa1, pa8), (pb1, pb8)):
        assert int(single_pool.n) == int(mesh_pool.n)
        # step-2 fakes (computed from once-updated params) carry the
        # amplified reassociation noise: measured max |delta| 0.4-1.4e-3 on
        # ~0.02% of elements across runs, zero index/ordering disagreement.
        # 1e-2 on [-1,1] pixels still proves the LAW: a diverged pool
        # (different slot, different image) differs by O(1), not O(1e-3).
        np.testing.assert_allclose(np.asarray(single_pool.images),
                                   np.asarray(mesh_pool.images),
                                   rtol=0, atol=1e-2)
        # the replicated pool is bit-identical across its own shards
        assert mesh_pool.images.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(key1), np.asarray(key8))


@pytest.mark.slow
def test_cyclegan_step_with_image_pool(rng):
    """pools= threads replay buffers through the jitted step: returns the
    triple, losses stay finite, the pool fills, and the key advances."""
    from multi_style_transfer_gan_tpu.train import pool_init

    state = cyclegan_init_state(jax.random.PRNGKey(0), channels=4)
    g_tx, d_tx = make_optimizers()
    pools = ((pool_init(6, 64), pool_init(6, 64)), jax.random.PRNGKey(9))
    xa = jnp.asarray(np.tanh(rng.standard_normal((2, 64, 64, 3))),
                     jnp.float32)
    xb = jnp.asarray(np.tanh(rng.standard_normal((2, 64, 64, 3))),
                     jnp.float32)
    step = jax.jit(lambda s, p, a, b: cyclegan_train_step(
        s, a, b, g_tx, d_tx, pools=p))
    state, losses, pools = step(state, pools, xa, xb)
    state, losses, pools = step(state, pools, xa, xb)
    for k in ("d_loss", "g_loss", "cycle_loss"):
        assert np.isfinite(float(losses[k])), k
    (pa, pb), key = pools
    assert int(pa.n) == 4 and int(pb.n) == 4  # 2 steps x batch 2
    assert not np.array_equal(np.asarray(key),
                              np.asarray(jax.random.PRNGKey(9)))

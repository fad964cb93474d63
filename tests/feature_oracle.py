"""Torch functional oracles for the feature-extractor ports.

Independent NCHW re-implementations of torchvision's ``inception_v3``
(eval-mode, ``transform_input=True`` — the pretrained configuration used by
the reference's FID, m_test.py:16-34) and ``vgg16.features``, written
directly with ``torch.nn.functional`` so the JAX ports in
``metrics/inception.py`` and ``train/perceptual.py`` can be parity-tested
against torchvision-shaped random state dicts without torchvision installed.
"""

import numpy as np
import torch
import torch.nn.functional as F

# ---------------------------------------------------------------- inception

# every BasicConv2d: name -> (out, in, kh, kw)
_STEM = [
    ("Conv2d_1a_3x3", 32, 3, 3, 3),
    ("Conv2d_2a_3x3", 32, 32, 3, 3),
    ("Conv2d_2b_3x3", 64, 32, 3, 3),
    ("Conv2d_3b_1x1", 80, 64, 1, 1),
    ("Conv2d_4a_3x3", 192, 80, 3, 3),
]
_CFG_A = [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64)]
_CFG_C = [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
          ("Mixed_6e", 192)]
_CFG_E = [("Mixed_7b", 1280), ("Mixed_7c", 2048)]


def _block_convs():
    convs = list(_STEM)
    for n, cin, pf in _CFG_A:
        convs += [(f"{n}.branch1x1", 64, cin, 1, 1),
                  (f"{n}.branch5x5_1", 48, cin, 1, 1),
                  (f"{n}.branch5x5_2", 64, 48, 5, 5),
                  (f"{n}.branch3x3dbl_1", 64, cin, 1, 1),
                  (f"{n}.branch3x3dbl_2", 96, 64, 3, 3),
                  (f"{n}.branch3x3dbl_3", 96, 96, 3, 3),
                  (f"{n}.branch_pool", pf, cin, 1, 1)]
    n = "Mixed_6a"
    convs += [(f"{n}.branch3x3", 384, 288, 3, 3),
              (f"{n}.branch3x3dbl_1", 64, 288, 1, 1),
              (f"{n}.branch3x3dbl_2", 96, 64, 3, 3),
              (f"{n}.branch3x3dbl_3", 96, 96, 3, 3)]
    for n, c7 in _CFG_C:
        convs += [(f"{n}.branch1x1", 192, 768, 1, 1),
                  (f"{n}.branch7x7_1", c7, 768, 1, 1),
                  (f"{n}.branch7x7_2", c7, c7, 1, 7),
                  (f"{n}.branch7x7_3", 192, c7, 7, 1),
                  (f"{n}.branch7x7dbl_1", c7, 768, 1, 1),
                  (f"{n}.branch7x7dbl_2", c7, c7, 7, 1),
                  (f"{n}.branch7x7dbl_3", c7, c7, 1, 7),
                  (f"{n}.branch7x7dbl_4", c7, c7, 7, 1),
                  (f"{n}.branch7x7dbl_5", 192, c7, 1, 7),
                  (f"{n}.branch_pool", 192, 768, 1, 1)]
    n = "Mixed_7a"
    convs += [(f"{n}.branch3x3_1", 192, 768, 1, 1),
              (f"{n}.branch3x3_2", 320, 192, 3, 3),
              (f"{n}.branch7x7x3_1", 192, 768, 1, 1),
              (f"{n}.branch7x7x3_2", 192, 192, 1, 7),
              (f"{n}.branch7x7x3_3", 192, 192, 7, 1),
              (f"{n}.branch7x7x3_4", 192, 192, 3, 3)]
    for n, cin in _CFG_E:
        convs += [(f"{n}.branch1x1", 320, cin, 1, 1),
                  (f"{n}.branch3x3_1", 384, cin, 1, 1),
                  (f"{n}.branch3x3_2a", 384, 384, 1, 3),
                  (f"{n}.branch3x3_2b", 384, 384, 3, 1),
                  (f"{n}.branch3x3dbl_1", 448, cin, 1, 1),
                  (f"{n}.branch3x3dbl_2", 384, 448, 3, 3),
                  (f"{n}.branch3x3dbl_3a", 384, 384, 1, 3),
                  (f"{n}.branch3x3dbl_3b", 384, 384, 3, 1),
                  (f"{n}.branch_pool", 192, cin, 1, 1)]
    return convs


def make_inception_sd(rng):
    """Random torchvision-shaped inception_v3 state dict (plus the
    AuxLogits/fc keys the importer must skip)."""
    sd = {}
    for name, out, cin, kh, kw in _block_convs():
        fan_in = cin * kh * kw
        sd[f"{name}.conv.weight"] = torch.tensor(
            rng.normal(0, (2.0 / fan_in) ** 0.5, (out, cin, kh, kw)),
            dtype=torch.float32)
        sd[f"{name}.bn.weight"] = torch.tensor(
            rng.uniform(0.8, 1.2, out), dtype=torch.float32)
        sd[f"{name}.bn.bias"] = torch.tensor(
            rng.normal(0, 0.05, out), dtype=torch.float32)
        sd[f"{name}.bn.running_mean"] = torch.tensor(
            rng.normal(0, 0.1, out), dtype=torch.float32)
        sd[f"{name}.bn.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, out), dtype=torch.float32)
        sd[f"{name}.bn.num_batches_tracked"] = torch.tensor(0)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def _bconv(sd, name, x, *, stride=1, padding=0):
    h = F.conv2d(x, sd[f"{name}.conv.weight"], stride=stride, padding=padding)
    h = F.batch_norm(h, sd[f"{name}.bn.running_mean"],
                     sd[f"{name}.bn.running_var"], sd[f"{name}.bn.weight"],
                     sd[f"{name}.bn.bias"], training=False, eps=0.001)
    return F.relu(h)


def _avg3(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1)  # count_include_pad=True


def _incep_a(sd, n, x):
    b1 = _bconv(sd, f"{n}.branch1x1", x)
    b5 = _bconv(sd, f"{n}.branch5x5_2",
                _bconv(sd, f"{n}.branch5x5_1", x), padding=2)
    bd = _bconv(sd, f"{n}.branch3x3dbl_1", x)
    bd = _bconv(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _bconv(sd, f"{n}.branch3x3dbl_3", bd, padding=1)
    bp = _bconv(sd, f"{n}.branch_pool", _avg3(x))
    return torch.cat([b1, b5, bd, bp], 1)


def _incep_b(sd, n, x):
    b3 = _bconv(sd, f"{n}.branch3x3", x, stride=2)
    bd = _bconv(sd, f"{n}.branch3x3dbl_1", x)
    bd = _bconv(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _bconv(sd, f"{n}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _incep_c(sd, n, x):
    b1 = _bconv(sd, f"{n}.branch1x1", x)
    b7 = _bconv(sd, f"{n}.branch7x7_1", x)
    b7 = _bconv(sd, f"{n}.branch7x7_2", b7, padding=(0, 3))
    b7 = _bconv(sd, f"{n}.branch7x7_3", b7, padding=(3, 0))
    bd = _bconv(sd, f"{n}.branch7x7dbl_1", x)
    bd = _bconv(sd, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _bconv(sd, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _bconv(sd, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _bconv(sd, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _bconv(sd, f"{n}.branch_pool", _avg3(x))
    return torch.cat([b1, b7, bd, bp], 1)


def _incep_d(sd, n, x):
    b3 = _bconv(sd, f"{n}.branch3x3_2",
                _bconv(sd, f"{n}.branch3x3_1", x), stride=2)
    b7 = _bconv(sd, f"{n}.branch7x7x3_1", x)
    b7 = _bconv(sd, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _bconv(sd, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _bconv(sd, f"{n}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _incep_e(sd, n, x):
    b1 = _bconv(sd, f"{n}.branch1x1", x)
    b3 = _bconv(sd, f"{n}.branch3x3_1", x)
    b3 = torch.cat([
        _bconv(sd, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
        _bconv(sd, f"{n}.branch3x3_2b", b3, padding=(1, 0))], 1)
    bd = _bconv(sd, f"{n}.branch3x3dbl_1", x)
    bd = _bconv(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat([
        _bconv(sd, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _bconv(sd, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
    bp = _bconv(sd, f"{n}.branch_pool", _avg3(x))
    return torch.cat([b1, b3, bd, bp], 1)


@torch.no_grad()
def inception_pool_features_torch(sd, imgs01_nchw):
    """[0,1] NCHW 299x299 -> (N, 2048), torchvision pretrained semantics:
    imagenet normalize then the model's transform_input step (== 2x-1)."""
    x = imgs01_nchw * 2.0 - 1.0
    x = _bconv(sd, "Conv2d_1a_3x3", x, stride=2)
    x = _bconv(sd, "Conv2d_2a_3x3", x)
    x = _bconv(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = _bconv(sd, "Conv2d_3b_1x1", x)
    x = _bconv(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    for n, _, _ in _CFG_A:
        x = _incep_a(sd, n, x)
    x = _incep_b(sd, "Mixed_6a", x)
    for n, _ in _CFG_C:
        x = _incep_c(sd, n, x)
    x = _incep_d(sd, "Mixed_7a", x)
    for n, _ in _CFG_E:
        x = _incep_e(sd, n, x)
    return x.mean(dim=(2, 3))


# -------------------------------------------------------------------- vgg16

_VGG16_CONVS = ((0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
                (10, 128, 256), (12, 256, 256), (14, 256, 256),
                (17, 256, 512), (19, 512, 512), (21, 512, 512))
_VGG_POOL_AFTER = {2, 7, 14}


def make_vgg16_sd(rng):
    sd = {}
    for idx, cin, cout in _VGG16_CONVS:
        fan_in = cin * 9
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, (2.0 / fan_in) ** 0.5, (cout, cin, 3, 3)),
            dtype=torch.float32)
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.05, cout), dtype=torch.float32)
    return sd


@torch.no_grad()
def vgg16_taps_torch(sd, x_nchw, taps=(2, 7, 14, 21)):
    """x in [-1,1] NCHW -> {conv_idx: relu output}, torchvision
    vgg16.features semantics with imagenet preprocessing."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    h = ((x_nchw + 1.0) * 0.5 - mean) / std
    feats = {}
    for idx, _, _ in _VGG16_CONVS:
        h = F.relu(F.conv2d(h, sd[f"features.{idx}.weight"],
                            sd[f"features.{idx}.bias"], padding=1))
        if idx in taps:
            feats[idx] = h
            if idx == max(taps):
                break
        if idx in _VGG_POOL_AFTER:
            h = F.max_pool2d(h, 2, 2)
    return feats

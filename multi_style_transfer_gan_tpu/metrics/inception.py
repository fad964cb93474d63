"""InceptionV3 feature extractor in JAX (torchvision-weight compatible).

The reference's FID uses torchvision's pretrained ``inception_v3`` pool
features (m_test.py:16-34). torchvision is not installed here and the build
environment has no network egress, so no weights ship with the framework —
but this is a faithful architecture port: feed it a torchvision
``inception_v3`` ``state_dict()`` saved as .pth and
``metrics.fid_harness.run_fid_eval(feature_fn=...)`` produces standard
Inception-pool FID numbers.

Structure per torchvision: BasicConv2d = conv(bias=False) + BN(eps=1e-3) +
ReLU; stem -> Mixed_5b..5d (InceptionA) -> Mixed_6a (B) -> Mixed_6b..6e (C)
-> Mixed_7a (D) -> Mixed_7b,7c (E) -> global average pool -> (N, 2048).
NHWC layout; weights imported from OIHW.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core import conv2d
from ..ops import resize


def inception_from_torch_sd(sd) -> dict:
    """Import a torchvision inception_v3 state_dict (.pth already loaded)."""
    params = {}
    for k, v in sd.items():
        arr = np.asarray(v)
        if k.startswith("AuxLogits") or k.startswith("fc."):
            continue
        if k.endswith("conv.weight"):
            params[k] = jnp.asarray(np.transpose(arr, (2, 3, 1, 0)))
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            params[k] = jnp.asarray(arr, jnp.float32)
    return params


def _bconv(p, name, x, *, stride=1, padding=0):
    """BasicConv2d: conv(bias=False) + BN(eps=0.001) + relu.

    ``padding`` may be an (ph, pw) pair for the asymmetric 1x7 / 7x1 convs.
    """
    w = p[f"{name}.conv.weight"]
    h = conv2d(x, w, stride=stride, padding=padding)
    g = p[f"{name}.bn.weight"]
    b = p[f"{name}.bn.bias"]
    m = p[f"{name}.bn.running_mean"]
    v = p[f"{name}.bn.running_var"]
    h = (h - m) * lax.rsqrt(v + 1e-3) * g + b
    return jnp.maximum(h, 0)


def _maxpool(x, k=3, s=2, pad=0):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1),
                             [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avgpool3(x):
    # torchvision's branch_pool is F.avg_pool2d(3, stride=1, padding=1) with
    # the default count_include_pad=True: border windows divide by 9, not by
    # the in-bounds count.
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _inception_a(p, n, x):
    b1 = _bconv(p, f"{n}.branch1x1", x)
    b5 = _bconv(p, f"{n}.branch5x5_1", x)
    b5 = _bconv(p, f"{n}.branch5x5_2", b5, padding=2)
    b3 = _bconv(p, f"{n}.branch3x3dbl_1", x)
    b3 = _bconv(p, f"{n}.branch3x3dbl_2", b3, padding=1)
    b3 = _bconv(p, f"{n}.branch3x3dbl_3", b3, padding=1)
    bp = _bconv(p, f"{n}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b5, b3, bp], -1)


def _inception_b(p, n, x):
    b3 = _bconv(p, f"{n}.branch3x3", x, stride=2)
    bd = _bconv(p, f"{n}.branch3x3dbl_1", x)
    bd = _bconv(p, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _bconv(p, f"{n}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool(x)], -1)


def _inception_c(p, n, x):
    b1 = _bconv(p, f"{n}.branch1x1", x)
    b7 = _bconv(p, f"{n}.branch7x7_1", x)
    b7 = _bconv(p, f"{n}.branch7x7_2", b7, padding=(0, 3))
    b7 = _bconv(p, f"{n}.branch7x7_3", b7, padding=(3, 0))
    bd = _bconv(p, f"{n}.branch7x7dbl_1", x)
    bd = _bconv(p, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _bconv(p, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _bconv(p, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _bconv(p, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _bconv(p, f"{n}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b7, bd, bp], -1)


def _inception_d(p, n, x):
    b3 = _bconv(p, f"{n}.branch3x3_1", x)
    b3 = _bconv(p, f"{n}.branch3x3_2", b3, stride=2)
    b7 = _bconv(p, f"{n}.branch7x7x3_1", x)
    b7 = _bconv(p, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _bconv(p, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _bconv(p, f"{n}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool(x)], -1)


def _inception_e(p, n, x):
    b1 = _bconv(p, f"{n}.branch1x1", x)
    b3 = _bconv(p, f"{n}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _bconv(p, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
        _bconv(p, f"{n}.branch3x3_2b", b3, padding=(1, 0)),
    ], -1)
    bd = _bconv(p, f"{n}.branch3x3dbl_1", x)
    bd = _bconv(p, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = jnp.concatenate([
        _bconv(p, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _bconv(p, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0)),
    ], -1)
    bp = _bconv(p, f"{n}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b3, bd, bp], -1)


def inception_pool_features(params, imgs01):
    """(N, H, W, 3) in [0,1] -> (N, 2048) pool features.

    Matches torchvision pretrained semantics (m_test.py:28-34): resize to
    299, imagenet-normalize, then the model's own ``transform_input=True``
    step (weights-loaded ``inception_v3`` always enables it). Normalize by
    (mean, std) followed by ``x*std/0.5 + (mean-0.5)/0.5`` composes to
    exactly ``2x - 1``, which is what we apply.
    """
    x = resize(imgs01.astype(jnp.float32), (299, 299), method="bilinear")
    x = 2.0 * x - 1.0
    x = _bconv(params, "Conv2d_1a_3x3", x, stride=2)
    x = _bconv(params, "Conv2d_2a_3x3", x)
    x = _bconv(params, "Conv2d_2b_3x3", x, padding=1)
    x = _maxpool(x)
    x = _bconv(params, "Conv2d_3b_1x1", x)
    x = _bconv(params, "Conv2d_4a_3x3", x)
    x = _maxpool(x)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params, n, x)
    x = _inception_b(params, "Mixed_6a", x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, n, x)
    x = _inception_d(params, "Mixed_7a", x)
    for n in ("Mixed_7b", "Mixed_7c"):
        x = _inception_e(params, n, x)
    return jnp.mean(x, axis=(1, 2))


def make_inception_feature_fn(weights_path):
    """Build a feature_fn for fid_harness.run_fid_eval from a torchvision
    inception_v3 state_dict .pth."""
    from ..weights import load_pth, extract_state_dict

    ckpt = load_pth(weights_path)
    sd = ckpt
    if isinstance(ckpt, dict) and "Conv2d_1a_3x3.conv.weight" not in ckpt:
        sd = extract_state_dict(ckpt)
    params = inception_from_torch_sd(sd)
    fwd = jax.jit(lambda p, x: inception_pool_features(p, x))

    def feature_fn(imgs01):
        return np.asarray(fwd(params, imgs01))

    return feature_fn

"""Functional PyTorch oracles for full-model parity tests.

These consume torch-layout state dicts (the exact checkpoint schema the
reference project saves) and compute forward passes with torch.nn.functional
only — no Module classes. They define the ground-truth numerics our JAX
models must reproduce after `.pth` import (the SSIM>=0.99 requirement).
"""

import numpy as np
import torch
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# plain CycleGAN generator (reference pretrain.py:60-97 architecture)
# ---------------------------------------------------------------------------

def plain_generator_forward(sd, x):
    g = lambda k: sd[k]

    def bn(h, p):
        return F.batch_norm(h, g(f"{p}.running_mean"), g(f"{p}.running_var"),
                            g(f"{p}.weight"), g(f"{p}.bias"), training=False)

    h = F.leaky_relu(F.conv2d(x, g("encoder.0.weight"), g("encoder.0.bias"),
                              stride=2, padding=1), 0.2)
    for i in (2, 5, 8):
        h = F.conv2d(h, g(f"encoder.{i}.weight"), g(f"encoder.{i}.bias"),
                     stride=2, padding=1)
        h = F.leaky_relu(bn(h, f"encoder.{i + 1}"), 0.2)
    for i in (0, 3, 6):
        h = F.conv_transpose2d(h, g(f"decoder.{i}.weight"),
                               g(f"decoder.{i}.bias"), stride=2, padding=1)
        h = F.relu(bn(h, f"decoder.{i + 1}"))
    h = F.conv_transpose2d(h, g("decoder.9.weight"), g("decoder.9.bias"),
                           stride=2, padding=1)
    return torch.tanh(h)


# ---------------------------------------------------------------------------
# enhanced generator pieces (reference enhanced_generator.py semantics)
# ---------------------------------------------------------------------------

def local_attention_forward(sd, p, x, ws=4):
    B, C, H, W = x.shape
    xw = (x.view(B, C, H // ws, ws, W // ws, ws)
           .permute(0, 2, 4, 1, 3, 5).reshape(-1, C, ws, ws))
    qkv = F.conv2d(xw, sd[p + "qkv.weight"], sd[p + "qkv.bias"])
    q, k, v = qkv.chunk(3, dim=1)
    attn = (F.normalize(q, dim=1).flatten(2)
            @ F.normalize(k, dim=1).flatten(2).transpose(-2, -1))
    attn = attn.softmax(dim=-1)
    out = (attn @ v.flatten(2)).view(-1, C, ws, ws)
    out = F.conv2d(out, sd[p + "proj.weight"], sd[p + "proj.bias"])
    out = (out.view(B, H // ws, W // ws, C, ws, ws)
              .permute(0, 3, 1, 4, 2, 5).reshape(B, C, H, W))
    return out


_MSB = (("branch1", 0, 1), ("branch2", 1, 1), ("branch3", 2, 2),
        ("branch4", 4, 4))


def multi_scale_forward(sd, p, x):
    outs = []
    for name, pad, dil in _MSB:
        h = F.conv2d(x, sd[f"{p}{name}.0.weight"], sd[f"{p}{name}.0.bias"],
                     padding=pad, dilation=dil)
        outs.append(F.relu(F.instance_norm(h)))
    h = torch.cat(outs, dim=1)
    h = F.conv2d(h, sd[p + "fusion.0.weight"], sd[p + "fusion.0.bias"])
    return F.relu(F.instance_norm(h)) + x


def structural_block_forward(sd, p, tokens, style, orig, grid_hw, window=8):
    """Oracle for OUR StructuralTransformerBlock design (see
    models/structural_transformer.py docstring for the spec)."""
    B, N, C = tokens.shape
    H, W = grid_hw
    s = F.relu(F.conv2d(orig, sd[p + "struct_embed.0.weight"],
                        sd[p + "struct_embed.0.bias"], stride=2, padding=1))
    s = F.relu(F.conv2d(s, sd[p + "struct_embed.2.weight"],
                        sd[p + "struct_embed.2.bias"], stride=2, padding=1))
    if s.shape[-2:] != (H, W):
        s = F.interpolate(s, size=(H, W), mode="bilinear", align_corners=False)
    st = F.linear(s.flatten(2).transpose(1, 2), sd[p + "struct_proj.weight"],
                  sd[p + "struct_proj.bias"])

    mod = F.linear(style, sd[p + "style_mod.weight"], sd[p + "style_mod.bias"])
    gamma, beta = mod.chunk(2, dim=-1)

    h = F.layer_norm(tokens + st, (C,), sd[p + "norm1.weight"],
                     sd[p + "norm1.bias"])
    h = h * (1.0 + gamma[:, None, :]) + beta[:, None, :]

    # windowed MHSA
    heads = max(1, C // 32)
    hd = C // heads
    qkv = F.linear(h, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
    xg = qkv.view(B, H, W, 3 * C)
    ph, pw = (-H) % window, (-W) % window
    if ph or pw:
        xg = F.pad(xg, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    nh, nw = Hp // window, Wp // window
    xg = (xg.view(B, nh, window, nw, window, 3 * C)
            .permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, 3 * C))
    q, k, v = xg.chunk(3, dim=-1)

    def heads_split(t):
        Bw, T, _ = t.shape
        return t.view(Bw, T, heads, hd).permute(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    attn = (q @ k.transpose(-2, -1)) / (hd ** 0.5)
    if ph or pw:
        # padded keys are masked out (spec: padded tokens only attend
        # within their window and are cropped after — their zero-qkv
        # exp(0) terms must not dilute real queries' softmax)
        valid = torch.ones(H, W)
        valid = F.pad(valid, (0, pw, 0, ph))
        valid = (valid.view(nh, window, nw, window)
                      .permute(0, 2, 1, 3).reshape(nh * nw, window * window))
        valid = valid.repeat(B, 1)[:, None, None, :]
        attn = attn.masked_fill(valid == 0, float("-inf"))
    attn = attn.softmax(dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(-1, window * window, C)
    out = (out.view(B, nh, nw, window, window, C)
              .permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C))
    if ph or pw:
        out = out[:, :H, :W, :]
    out = F.linear(out.reshape(B, N, C), sd[p + "attn.proj.weight"],
                   sd[p + "attn.proj.bias"])
    tokens = tokens + out

    h = F.layer_norm(tokens, (C,), sd[p + "norm2.weight"], sd[p + "norm2.bias"])
    h = F.linear(h, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
    return tokens + h


def enhanced_generator_forward(sd, x, num_blocks=1):
    orig = x
    h = F.relu(F.instance_norm(
        F.conv2d(x, sd["initial.0.weight"], sd["initial.0.bias"], padding=3)))
    for name in ("down1", "down2"):
        h = F.conv2d(h, sd[f"{name}.0.weight"], sd[f"{name}.0.bias"],
                     stride=2, padding=1)
        h = F.relu(F.instance_norm(h))
        h = local_attention_forward(sd, f"{name}.3.", h, ws=4)
        h = multi_scale_forward(sd, f"{name}.4.", h)

    style = F.relu(F.linear(h.mean(dim=(2, 3)), sd["style_encoder.2.weight"],
                            sd["style_encoder.2.bias"]))
    B, C, H, W = h.shape
    tokens = h.flatten(2).transpose(1, 2)
    for i in range(num_blocks):
        tokens = structural_block_forward(sd, f"transformer_blocks.{i}.",
                                          tokens, style, orig, (H, W))
    h = tokens.transpose(1, 2).view(B, C, H, W)

    for name in ("up1", "up2"):
        h = F.conv_transpose2d(h, sd[f"{name}.0.weight"],
                               sd[f"{name}.0.bias"], stride=2, padding=1)
        h = F.relu(F.instance_norm(h))
        h = local_attention_forward(sd, f"{name}.3.", h, ws=4)
        h = multi_scale_forward(sd, f"{name}.4.", h)

    h = F.conv2d(h, sd["output.0.weight"], sd["output.0.bias"], padding=3)
    return torch.tanh(h)


# ---------------------------------------------------------------------------
# discriminator (reference enhanced_generator.py:230-275)
# ---------------------------------------------------------------------------

def _sn_weight_eval(sd, name):
    w = sd[f"{name}.weight_orig"]
    u, v = sd[f"{name}.weight_u"], sd[f"{name}.weight_v"]
    sigma = torch.einsum("i,ij,j->", u, w.flatten(1), v)
    return w / sigma


def discriminator_forward(sd, x):
    def snconv(h, name, stride=1, padding=1):
        return F.conv2d(h, _sn_weight_eval(sd, name), sd[f"{name}.bias"],
                        stride=stride, padding=padding)

    h = F.leaky_relu(snconv(x, "main.0", stride=2), 0.2)
    h = F.leaky_relu(F.instance_norm(snconv(h, "main.2", stride=2)), 0.2)
    h = F.leaky_relu(F.instance_norm(snconv(h, "main.5", stride=2)), 0.2)
    feats = F.leaky_relu(F.instance_norm(snconv(h, "main.8", stride=2)), 0.2)
    score = snconv(feats, "batch_head.0").mean(dim=(1, 2, 3))
    s = F.leaky_relu(F.instance_norm(snconv(feats, "structure_head.0")), 0.2)
    struct = snconv(s, "structure_head.3")
    return score, struct


# ---------------------------------------------------------------------------
# random state-dict builders (reference architecture shapes)
# ---------------------------------------------------------------------------

def _t(rng, *shape, scale=0.1):
    return torch.from_numpy(
        rng.standard_normal(shape).astype(np.float32) * scale)


def make_plain_sd(rng, c=64):
    sd = {}
    enc = [(3, c), (c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c)]
    dec = [(8 * c, 4 * c), (4 * c, 2 * c), (2 * c, c), (c, 3)]
    for i, idx in enumerate((0, 2, 5, 8)):
        ci, co = enc[i]
        sd[f"encoder.{idx}.weight"] = _t(rng, co, ci, 4, 4)
        sd[f"encoder.{idx}.bias"] = _t(rng, co)
        if i > 0:
            p = f"encoder.{idx + 1}"
            sd[f"{p}.weight"] = _t(rng, co, scale=1.0).abs() + 0.5
            sd[f"{p}.bias"] = _t(rng, co)
            sd[f"{p}.running_mean"] = _t(rng, co)
            sd[f"{p}.running_var"] = _t(rng, co, scale=1.0).abs() + 0.5
            sd[f"{p}.num_batches_tracked"] = torch.tensor(100)
    for i, idx in enumerate((0, 3, 6, 9)):
        ci, co = dec[i]
        sd[f"decoder.{idx}.weight"] = _t(rng, ci, co, 4, 4)  # IOHW
        sd[f"decoder.{idx}.bias"] = _t(rng, co)
        if i < 3:
            p = f"decoder.{idx + 1}"
            sd[f"{p}.weight"] = _t(rng, co, scale=1.0).abs() + 0.5
            sd[f"{p}.bias"] = _t(rng, co)
            sd[f"{p}.running_mean"] = _t(rng, co)
            sd[f"{p}.running_var"] = _t(rng, co, scale=1.0).abs() + 0.5
            sd[f"{p}.num_batches_tracked"] = torch.tensor(100)
    return sd


def _attn_sd(rng, sd, p, c):
    sd[f"{p}qkv.weight"] = _t(rng, 3 * c, c, 1, 1)
    sd[f"{p}qkv.bias"] = _t(rng, 3 * c)
    sd[f"{p}proj.weight"] = _t(rng, c, c, 1, 1)
    sd[f"{p}proj.bias"] = _t(rng, c)


def _msb_sd(rng, sd, p, c):
    for name, k in (("branch1", 1), ("branch2", 3), ("branch3", 3),
                    ("branch4", 3)):
        sd[f"{p}{name}.0.weight"] = _t(rng, c // 4, c, k, k)
        sd[f"{p}{name}.0.bias"] = _t(rng, c // 4)
    sd[f"{p}fusion.0.weight"] = _t(rng, c, c, 1, 1)
    sd[f"{p}fusion.0.bias"] = _t(rng, c)


def make_enhanced_sd(rng, c=16, num_blocks=1):
    sd = {"initial.0.weight": _t(rng, c, 3, 7, 7), "initial.0.bias": _t(rng, c)}
    for name, ci, co in (("down1", c, 2 * c), ("down2", 2 * c, 4 * c)):
        sd[f"{name}.0.weight"] = _t(rng, co, ci, 4, 4)
        sd[f"{name}.0.bias"] = _t(rng, co)
        _attn_sd(rng, sd, f"{name}.3.", co)
        _msb_sd(rng, sd, f"{name}.4.", co)
    d = 4 * c
    for i in range(num_blocks):
        p = f"transformer_blocks.{i}."
        sd[p + "struct_embed.0.weight"] = _t(rng, d // 2, 3, 3, 3)
        sd[p + "struct_embed.0.bias"] = _t(rng, d // 2)
        sd[p + "struct_embed.2.weight"] = _t(rng, d, d // 2, 3, 3)
        sd[p + "struct_embed.2.bias"] = _t(rng, d)
        for nm, o, i2 in (("struct_proj", d, d), ("style_mod", 2 * d, d),
                          ("attn.qkv", 3 * d, d), ("attn.proj", d, d),
                          ("mlp.fc1", 4 * d, d), ("mlp.fc2", d, 4 * d)):
            sd[f"{p}{nm}.weight"] = _t(rng, o, i2)
            sd[f"{p}{nm}.bias"] = _t(rng, o)
        for nm in ("norm1", "norm2"):
            sd[f"{p}{nm}.weight"] = torch.ones(d)
            sd[f"{p}{nm}.bias"] = torch.zeros(d)
    for name, ci, co in (("up1", 4 * c, 2 * c), ("up2", 2 * c, c)):
        sd[f"{name}.0.weight"] = _t(rng, ci, co, 4, 4)  # IOHW
        sd[f"{name}.0.bias"] = _t(rng, co)
        _attn_sd(rng, sd, f"{name}.3.", co)
        _msb_sd(rng, sd, f"{name}.4.", co)
    sd["output.0.weight"] = _t(rng, 3, c, 7, 7)
    sd["output.0.bias"] = _t(rng, 3)
    sd["style_encoder.2.weight"] = _t(rng, d, d)
    sd["style_encoder.2.bias"] = _t(rng, d)
    return sd


def make_discriminator_sd(rng, c=16):
    convs = (("main.0", 4, 3, c), ("main.2", 4, c, 2 * c),
             ("main.5", 4, 2 * c, 4 * c), ("main.8", 4, 4 * c, 8 * c),
             ("batch_head.0", 4, 8 * c, 1),
             ("structure_head.0", 3, 8 * c, 8 * c),
             ("structure_head.3", 4, 8 * c, 1))
    sd = {}
    for name, k, ci, co in convs:
        sd[f"{name}.weight_orig"] = _t(rng, co, ci, k, k)
        sd[f"{name}.bias"] = _t(rng, co)
        u = rng.standard_normal(co).astype(np.float32)
        v = rng.standard_normal(ci * k * k).astype(np.float32)
        sd[f"{name}.weight_u"] = torch.from_numpy(u / np.linalg.norm(u))
        sd[f"{name}.weight_v"] = torch.from_numpy(v / np.linalg.norm(v))
    return sd

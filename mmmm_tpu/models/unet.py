"""Compact 3-D UNet for the segmentation ablation harness.

Equivalent of the reference's ``scripts/_seg-exp/unet.py`` baseline (a MONAI
UNet wrapped for the base/sam/unet comparison): a plain encoder-decoder with
strided-conv downsampling, instance-norm + leaky-ReLU blocks, skip
concatenations, and a per-class logit head. Functional params-as-dicts like
every other model here; NDHWC layout so convs map straight onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_params(rng, k, c_in, c_out):
    fan = k ** 3 * c_in
    return {
        "w": jax.random.normal(rng, (k, k, k, c_in, c_out)) * (2.0 / fan) ** 0.5,
        "b": jnp.zeros((c_out,)),
    }


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride,) * 3, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"]


def _inorm(p, x, eps=1e-5):
    m = x.mean((1, 2, 3), keepdims=True)
    v = ((x - m) ** 2).mean((1, 2, 3), keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _norm_params(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _block_params(rng, c_in, c_out):
    k1, k2 = jax.random.split(rng)
    return {
        "conv1": _conv_params(k1, 3, c_in, c_out),
        "n1": _norm_params(c_out),
        "conv2": _conv_params(k2, 3, c_out, c_out),
        "n2": _norm_params(c_out),
    }


def _block(p, x, stride=1):
    x = jax.nn.leaky_relu(_inorm(p["n1"], _conv(p["conv1"], x, stride)), 0.01)
    return jax.nn.leaky_relu(_inorm(p["n2"], _conv(p["conv2"], x)), 0.01)


def init_unet_params(rng, in_channels: int, num_classes: int,
                     channels=(16, 32, 64, 128)):
    ks = iter(jax.random.split(rng, 3 * len(channels) + 2))
    enc, dec = [], []
    c_prev = in_channels
    for i, c in enumerate(channels):
        enc.append(_block_params(next(ks), c_prev, c))
        c_prev = c
    for i in range(len(channels) - 2, -1, -1):
        c_skip = channels[i]
        dec.append({
            "up": _conv_params(next(ks), 1, c_prev, c_skip),
            "block": _block_params(next(ks), 2 * c_skip, c_skip),
        })
        c_prev = c_skip
    head = _conv_params(next(ks), 1, c_prev, num_classes)
    return {"enc": enc, "dec": dec, "head": head}


def unet_forward(params, image):
    """image (B, C, D, H, W) -> logits (B, num_classes, D, H, W)."""
    x = jnp.transpose(image, (0, 2, 3, 4, 1))  # NDHWC
    skips = []
    for i, p in enumerate(params["enc"]):
        x = _block(p, x, stride=1 if i == 0 else 2)
        skips.append(x)
    x = skips.pop()
    for p in params["dec"]:
        skip = skips.pop()
        x = _conv(p["up"], x)
        x = jax.image.resize(x, (*skip.shape[:-1], x.shape[-1]), "trilinear")
        x = _block(p["block"], jnp.concatenate([x, skip], axis=-1))
    logits = _conv(params["head"], x)
    return jnp.transpose(logits, (0, 4, 1, 2, 3))

"""Spatial resampling + variable-depth (z) patch ops.

This is the TPU formulation of the reference's "any-resolution 2-D/3-D in one
model" trick (``mmmm/models/resample.py``): a single Conv3d patch-embedding
weight stored at the maximum z kernel whose z extent is *summed down* at call
time to the sample's ``patch_size_z``, and a ConvTranspose3d upsampler whose z
kernel collapses to 1 for thin volumes.

TPU-first design decisions:
  - patch size is a static (bucketed) Python int per compiled variant, so the
    collapsed weight is a compile-time constant folding away entirely;
  - the strided convs are expressed as reshape + one big matmul (stride ==
    kernel, no overlap), which maps straight onto the MXU instead of relying on
    XLA convolution lowering;
  - interpolation uses ``jax.image.resize`` half-pixel linear sampling (the
    analog of ``torch.nn.functional.interpolate(align_corners=False)``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _linear_interp_matrix(old: int, new: int) -> jnp.ndarray:
    """(new, old) half-pixel linear interpolation matrix, NO anti-aliasing.

    Exactly ``torch.nn.functional.interpolate(mode='linear'/'bilinear'/
    'trilinear', align_corners=False)``: source centers ``(i+0.5)*old/new-0.5``
    clamped at 0, two-tap lerp. ``jax.image.resize`` is NOT equivalent — it
    widens the kernel (anti-aliases) when downsampling, which would silently
    diverge from the reference's checkpoint surgery (``visual.py:44``,
    e.g. the 35x35 -> 32x32 position-embedding downsample).
    Dense-matrix form so resizes lower to MXU matmuls, not gathers.
    """
    import numpy as np

    centers = np.clip((np.arange(new) + 0.5) * (old / new) - 0.5, 0.0, old - 1.0)
    lo = np.floor(centers).astype(np.int64)
    hi = np.minimum(lo + 1, old - 1)
    frac = (centers - lo).astype(np.float32)
    w = np.zeros((new, old), np.float32)
    w[np.arange(new), lo] += 1.0 - frac
    w[np.arange(new), hi] += frac
    return jnp.asarray(w)


def resample_nd(x: jnp.ndarray, shape: tuple[int, ...], scale: bool = False) -> jnp.ndarray:
    """Linearly resample the trailing spatial dims of ``x`` to ``shape``.

    Equivalent of the reference's ``luolib.models.spadop.resample`` (used for
    position-embedding and conv-kernel adaptation, ``visual.py:44,66``), i.e.
    torch ``interpolate(align_corners=False)`` numerics in every regime
    (verified against torch in ``tests/test_torch_parity.py``).
    ``scale=True`` preserves the summed response when resizing conv kernels.
    """
    spatial = x.shape[x.ndim - len(shape):]
    if tuple(spatial) == tuple(shape):
        return x
    out = x
    dtype = x.dtype
    if dtype != jnp.float32:
        out = out.astype(jnp.float32)
    lead = x.ndim - len(shape)
    for i, (old, new) in enumerate(zip(spatial, shape)):
        if old == new:
            continue
        w = _linear_interp_matrix(old, new)  # (new, old)
        axis = lead + i
        out = jnp.moveaxis(jnp.tensordot(out, w, axes=[[axis], [1]]), -1, axis)
    if scale:
        out = out * (math.prod(spatial) / math.prod(shape))
    return out.astype(dtype)


def collapse_patch_weight_z(weight: jnp.ndarray, patch_size_z: int) -> jnp.ndarray:
    """Sum-reduce a (Cout, Cin, Dmax, H, W) conv kernel to z extent ``patch_size_z``.

    Mirrors ``resample.Downsample.forward`` (``mmmm/models/resample.py:55-62``):
    groups of ``Dmax / patch_size_z`` consecutive z slices are summed so a patch
    of any depth produces the same embedding scale.
    """
    d_max = weight.shape[2]
    if d_max == patch_size_z:
        return weight
    if d_max % patch_size_z != 0:
        raise ValueError(f"stored z kernel {d_max} not divisible by patch_size_z {patch_size_z}")
    co, ci, _, h, w = weight.shape
    return weight.reshape(co, ci, patch_size_z, d_max // patch_size_z, h, w).sum(axis=3)


def variable_patch_embed_3d(
    x: jnp.ndarray,  # (B, C, D, H, W)
    weight: jnp.ndarray,  # (Cout, Cin, Dmax, Ph, Pw)
    bias: jnp.ndarray | None,
    patch_size: tuple[int, int, int],
) -> jnp.ndarray:
    """Non-overlapping patch embedding with a runtime-chosen z patch size.

    Returns (B, Cout, D/pz, H/ph, W/pw). The conv (stride == kernel) is computed
    as patch extraction + one matmul so the MXU does all the work.
    """
    pz, ph, pw = patch_size
    w = collapse_patch_weight_z(weight, pz)
    b_, c, d, h, wd = x.shape
    if d % pz or h % ph or wd % pw:
        raise ValueError(f"image shape {(d, h, wd)} not divisible by patch {patch_size}")
    gd, gh, gw = d // pz, h // ph, wd // pw
    wmat = w.transpose(2, 3, 1, 4, 0).reshape(pz * ph * c * pw, -1)

    def embed(xc):  # (bc, C, D, H, W) -> (bc, T, Cout) fp-accumulated
        bc = xc.shape[0]
        patches = xc.reshape(bc, c, gd, pz, gh, ph, gw, pw)
        # contraction order (pz, ph, c, pw): keeps (c, pw) — the innermost
        # input strides — adjacent in the transpose, which is 23% faster
        # on-chip than the (c, pz, ph, pw) order (42 vs 55 ms at B16 bench
        # shapes); the NCDHW/NDHWC lax.conv lowerings measured slower still
        patches = patches.transpose(0, 2, 4, 6, 3, 5, 1, 7).reshape(
            bc, gd * gh * gw, pz * ph * c * pw
        )
        out = jnp.dot(patches, wmat.astype(patches.dtype), preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)

    # The 8-D im2col intermediates are tiled T(8,128) on their trailing
    # (gw, pw) dims — an 8x padding expansion at pw=16 that was the single
    # largest serving-prefill allocation (5 GB reshape + 3.4 GB transpose
    # copy at batch 24; it set the batch ceiling, not the KV cache). Chunk
    # the batch through lax.map so the padded transient stays bounded; the
    # per-chunk matmul is tiny next to prefill attention.
    pad8 = lambda v: -(-v // 8) * 8
    pad128 = lambda v: -(-v // 128) * 128
    padded_bytes = b_ * c * gd * pz * gh * ph * pad8(gw) * pad128(pw) * x.dtype.itemsize
    target = 512 * 1024 * 1024
    if padded_bytes > target and b_ > 1:
        chunk = max(1, b_ * target // padded_bytes)
        while b_ % chunk:
            chunk -= 1
        out = jax.lax.map(embed, x.reshape(b_ // chunk, chunk, c, d, h, wd))
        out = out.reshape(b_, gd * gh * gw, -1)
    else:
        out = embed(x)
    return out.reshape(b_, gd, gh, gw, -1).transpose(0, 4, 1, 2, 3)


def variable_upsample_3d(
    x: jnp.ndarray,  # (B, Cin, D, H, W)
    weight: jnp.ndarray,  # (Cin, Cout, 2, 2, 2) conv-transpose layout
    bias: jnp.ndarray | None,
    patch_size_z: int,
    cnt: int,
) -> jnp.ndarray:
    """Stride-2 transposed conv whose z kernel collapses for thin volumes.

    Mirrors ``resample.Upsample`` (``mmmm/models/resample.py:64-94``): if
    ``patch_size_z < 2 ** (cnt + 1)`` the z kernel is mean-collapsed to 1 so
    the z extent is not upsampled. Implemented as matmul + pixel shuffle.
    """
    threshold = 1 << (cnt + 1)
    collapse_z = patch_size_z < threshold
    w = weight.mean(axis=2, keepdims=True) if collapse_z else weight
    kz = w.shape[2]
    cin, cout = w.shape[0], w.shape[1]
    b_, c, d, h, wd = x.shape
    wmat = w.reshape(cin, cout * kz * 2 * 2)

    def up(xc):  # (bc, Cin, D, H, W) -> (bc, Cout, D*kz, 2H, 2W)
        bc = xc.shape[0]
        tokens = xc.transpose(0, 2, 3, 4, 1).reshape(bc, d * h * wd, cin)
        o = jnp.dot(tokens, wmat.astype(tokens.dtype), preferred_element_type=jnp.float32)
        o = o.astype(xc.dtype).reshape(bc, d, h, wd, cout, kz, 2, 2)
        # (b, cout, d, kz, h, 2, w, 2) -> (b, cout, d*kz, h*2, w*2)
        return o.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(bc, cout, d * kz, h * 2, wd * 2)

    # Same T(8,128)-padding hazard as the patch embed above: the pixel-shuffle
    # intermediates end in (w, 2) / (2, 2) dims, up to a 64x padded expansion.
    # Chunk the batch so the transient stays bounded.
    padded_bytes = b_ * d * h * wd * cout * kz * 8 * 128 * x.dtype.itemsize
    target = 512 * 1024 * 1024
    if padded_bytes > target and b_ > 1:
        chunk = max(1, b_ * target // padded_bytes)
        while b_ % chunk:
            chunk -= 1
        out = jax.lax.map(up, x.reshape(b_ // chunk, chunk, c, d, h, wd))
        out = out.reshape(b_, cout, d * kz, h * 2, wd * 2)
    else:
        out = up(x)
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, :, None, None, None]
    return out


def trilinear_resize(x: jnp.ndarray, shape: tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear upsample of (..., D, H, W) mask logits to the image grid."""
    return resample_nd(x, shape)


def nearest_resize(x: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    """Nearest-neighbor resize of trailing dims (label downsampling)."""
    return jax.image.resize(x, (*x.shape[: x.ndim - len(shape)], *shape), method="nearest")

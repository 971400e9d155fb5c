"""Multi-scale deformable attention tests vs a numpy reference."""
import jax.numpy as jnp
import numpy as np

from mmmm_tpu.ops.deform_attn import bilinear_sample, ms_deform_attn


def np_bilinear(value, x, y):
    h, w, c = value.shape
    x = x * w - 0.5
    y = y * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0

    def tap(yi, xi):
        if 0 <= yi < h and 0 <= xi < w:
            return value[yi, xi]
        return np.zeros(c)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def test_bilinear_sample_matches_numpy():
    rng = np.random.default_rng(0)
    value = rng.normal(size=(6, 8, 3)).astype(np.float32)
    pts = rng.uniform(-0.1, 1.1, size=(20, 2)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(value), jnp.asarray(pts)))
    want = np.stack([np_bilinear(value, float(p[0]), float(p[1])) for p in pts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_center_exact():
    value = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    # pixel centers: x = (j + 0.5)/W, y = (i + 0.5)/H
    pts = jnp.asarray([[(1 + 0.5) / 4, (2 + 0.5) / 3]])
    got = float(bilinear_sample(jnp.asarray(value), pts)[0, 0])
    assert got == value[2, 1, 0]


def test_ms_deform_attn():
    rng = np.random.default_rng(1)
    b, q, heads, head_dim, points = 2, 5, 2, 4, 3
    shapes = [(8, 8), (4, 4)]
    values = [jnp.asarray(rng.normal(size=(b, h, w, heads, head_dim)), jnp.float32) for h, w in shapes]
    locs = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, q, heads, len(shapes), points, 2)), jnp.float32)
    w_raw = rng.normal(size=(b, q, heads, len(shapes), points))
    w = np.exp(w_raw) / np.exp(w_raw).reshape(b, q, heads, -1).sum(-1)[..., None].reshape(b, q, heads, 1, 1)
    out = np.asarray(ms_deform_attn(values, locs, jnp.asarray(w, jnp.float32)))
    assert out.shape == (b, q, heads * head_dim)

    # numpy reference
    want = np.zeros((b, q, heads, head_dim))
    for bi in range(b):
        for lvl, (hh, ww) in enumerate(shapes):
            for hd in range(heads):
                vmap_ = np.asarray(values[lvl][bi, :, :, hd])
                for qi in range(q):
                    for p in range(points):
                        x, y = np.asarray(locs)[bi, qi, hd, lvl, p]
                        want[bi, qi, hd] += np_bilinear(vmap_, x, y) * w[bi, qi, hd, lvl, p]
    np.testing.assert_allclose(out, want.reshape(b, q, -1), atol=1e-4)

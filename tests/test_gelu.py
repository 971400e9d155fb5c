"""Exhaustive bf16 verification of the fitted exact-GELU (ops/gelu.py).

bf16 has only 65536 values, so "for all inputs" is a literal test. Claims
pinned here (and relied on to make the fitted path the bf16 default):

  * outside the flushed classes, the fitted path is correctly rounded except
    for a handful of half-ulp rounding ties (each a single bf16 grid step),
    while ``jax.nn.gelu(approximate=False)`` lands off the correctly-rounded
    value on two orders of magnitude more inputs;
  * the deep negative tail (x < -5) flushes to 0 with |true gelu| < 1.3e-6;
  * subnormal inputs/outputs may flush to 0 (TPU flushes subnormals anyway);
  * the fitted path's worst ulp-relative error vs f64 truth is below the
    erf chain's.

Parity anchor: the reference uses exact-erf GELU
(`/root/reference/mmmm/models/cogvlm/visual.py:115`).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmmm_tpu.ops.gelu import gelu, gelu_fitted

MIN_NORMAL = 1.1754944e-38  # bf16/f32 share the exponent range


@pytest.fixture(scope="module")
def exhaustive():
    from scipy.special import erf

    bits = np.arange(65536, dtype=np.uint16)
    x = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.bfloat16)
    x64 = np.asarray(x, np.float64)
    finite = np.isfinite(x64)
    xb = np.asarray(x)[finite]
    x64 = x64[finite]
    true = x64 * 0.5 * (1.0 + erf(x64 / np.sqrt(2.0)))
    ref = np.asarray(jnp.asarray(true).astype(jnp.bfloat16))  # correctly rounded
    got = np.asarray(jax.jit(gelu_fitted)(jnp.asarray(xb)))
    old = np.asarray(jax.jit(lambda v: jax.nn.gelu(v, approximate=False))(jnp.asarray(xb)))
    return x64, true, ref, got, old


def _half_ulp(v64):
    # HALF the bf16 grid spacing around |v| (7 stored mantissa bits -> ulp =
    # 2^(e-7); this returns 2^(e-8)). Correct rounding == error <= 1.0 in
    # these units.
    return np.maximum(2.0 ** (np.floor(np.log2(np.maximum(np.abs(v64), MIN_NORMAL))) - 8), 9.2e-41)


def test_exhaustive_classes(exhaustive):
    x64, true, ref, got, old = exhaustive
    g64 = got.astype(np.float64)
    r64 = ref.astype(np.float64)

    tail = x64 < -5.0  # the clamp flush starts strictly below -5
    assert np.all(g64[tail] == 0.0)
    assert np.abs(true[tail]).max() < 1.3e-6

    flushable = (np.abs(x64) < MIN_NORMAL) | (np.abs(true) < MIN_NORMAL)
    sub = flushable & ~tail
    assert np.all((got[sub] == ref[sub]) | (g64[sub] == 0.0))

    main = ~tail & ~flushable
    mism = got[main] != ref[main]
    # correctly rounded except a handful of half-ulp rounding ties (measured:
    # exactly 2), each a single bf16 grid step from the correct rounding
    assert mism.sum() <= 8, f"{mism.sum()} mismatches in the main range"
    step = 2.0 ** (np.floor(np.log2(np.abs(r64[main]) + 1e-300)) - 7)
    assert np.all(np.abs(g64[main] - r64[main]) <= step + 1e-45)
    # the erf chain deviates on two orders of magnitude more inputs (~770)
    old_mism = old[main] != ref[main]
    assert old_mism.sum() >= 100 * max(int(mism.sum()), 1)


def test_exhaustive_worst_error_beats_erf_chain(exhaustive):
    # half-ulp-relative worst error vs f64 truth (absolute error is the wrong
    # yardstick: a correctly-rounded result already carries up to half a bf16
    # ulp, ~0.0078 at |gelu| ~2.75, which dwarfs tail absolute errors).
    x64, true, ref, got, old = exhaustive
    tail = x64 < -5.0
    main = ~tail & (np.abs(true) >= MIN_NORMAL) & (np.abs(x64) >= MIN_NORMAL)
    hulp = _half_ulp(true)
    err_new = (np.abs(got.astype(np.float64) - true) / hulp)[main]
    o64 = np.where(np.isnan(old.astype(np.float64)), 0, old.astype(np.float64))
    err_old = (np.abs(o64 - true) / hulp)[main]
    # units below are HALF-ulps: <=1.0 == correctly rounded
    assert err_new.max() <= 1.1  # correct rounding + single-step ties (1.004 measured)
    assert err_old.max() > 2.0  # the chain strays beyond a full ulp (2 half-ulps)
    assert err_new.max() < err_old.max()


def test_fitted_special_values():
    x = jnp.asarray([np.inf, -np.inf, 0.0, -0.0, np.nan], jnp.bfloat16)
    out = np.asarray(gelu_fitted(x), np.float64)
    assert out[0] == np.inf
    assert out[1] == 0.0  # limit of gelu at -inf
    assert out[2] == 0.0 and out[3] == 0.0
    assert np.isnan(out[4])


def test_dispatcher_modes(monkeypatch):
    x = jnp.asarray(np.linspace(-4, 4, 64), jnp.bfloat16)
    monkeypatch.delenv("MMMM_GELU", raising=False)
    monkeypatch.delenv("MMMM_FAST_GELU", raising=False)
    np.testing.assert_array_equal(np.asarray(gelu(x)), np.asarray(gelu_fitted(x)))
    # fp32 keeps the plain erf path untouched
    xf = x.astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(gelu(xf)), np.asarray(jax.nn.gelu(xf, approximate=False))
    )
    monkeypatch.setenv("MMMM_GELU", "erf")
    np.testing.assert_array_equal(
        np.asarray(gelu(x)), np.asarray(jax.nn.gelu(x, approximate=False))
    )
    monkeypatch.setenv("MMMM_GELU", "tanh")
    np.testing.assert_array_equal(
        np.asarray(gelu(x)), np.asarray(jax.nn.gelu(x, approximate=True))
    )
    monkeypatch.delenv("MMMM_GELU")
    monkeypatch.setenv("MMMM_FAST_GELU", "1")
    np.testing.assert_array_equal(
        np.asarray(gelu(x)), np.asarray(jax.nn.gelu(x, approximate=True))
    )

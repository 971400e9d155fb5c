"""Exact (erf) GELU with a bf16 fast path that is *more* accurate than the
naive erf chain and ~as cheap as the tanh approximation.

Why this exists: the reference ViT/SAM MLPs use exact-erf GELU
(`/root/reference/mmmm/models/cogvlm/visual.py:115` via transformers
ACT2FN["gelu"]; `configuration_cogvlm.py` / checkpoint vision config), so the
tanh approximation (`jax.nn.gelu(approximate=True)`) is not parity-safe. But
on TPU `lax.erf` lowers to a long VPU polynomial with an exp branch (~69 ms
of a 24-image EVA prefill, ROADMAP), while tanh has fast hardware support.

The fast path here evaluates

    gelu(x) = x * sigmoid(2 u(x)),   u(x) ~= artanh(erf(x / sqrt(2)))

with ``u`` a degree-15 odd minimax-fitted polynomial on [-5, 5] (max |du| =
9.1e-6 — CDF error far below the bf16 half-ulp of 2^-9), computed in fp32
from the bf16 input with a SINGLE final rounding. The sigmoid form matters:
``0.5 * (1 + tanh(u))`` cancels catastrophically for u << 0 (the Gaussian
CDF tail), while ``sigmoid(2u) = exp(2u) / (1 + exp(2u))`` keeps full fp32
precision there. Exhaustively verified over all 65536 bf16 values
(tests/test_gelu.py; the sweep runs on CPU — tests pin jax to CPU — so the
bit-level rounding claims are backend-conditional on the fp32 sigmoid/poly
lowering; the fit margin of 9.1e-6 vs the bf16 half-ulp of ~2e-3 leaves
~200x headroom against backend drift):

  * outside the flushed classes below it is CORRECTLY ROUNDED (one rounding
    from f64) except for TWO half-ulp rounding ties, each off by a single
    bf16 grid step — while ``jax.nn.gelu(approximate=False)`` lands off the
    correctly-rounded value on ~770 inputs (up to ~1.5 ulps from f64 truth);
  * the deep negative tail x < -5 flushes to exactly 0 (|true gelu| there
    < 1.3e-6, and gelu(-inf) becomes 0 instead of the chain's NaN);
  * subnormal inputs/outputs may flush to 0 (TPU flushes subnormals anyway).

So for bf16 this path is strictly more accurate than the erf chain (and
closer to torch's fp32-internal single-rounding semantics — the parity
target) while running at tanh speed — which is why it is the default.
``MMMM_GELU`` overrides: ``fitted`` (force it), ``erf`` (the plain jax
chain), ``tanh`` (the non-parity approximation; also enabled by the legacy
``MMMM_FAST_GELU=1``).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Degree-15 odd minimax (Lawson-iterated least-squares) fit of
# artanh(erf(x/sqrt(2))) on [0, 5]: max |du| = 9.1e-6, i.e. CDF relative
# error orders of magnitude below the bf16 half-ulp of 2^-9. Leading term is
# sqrt(2/pi), as in the tanh approximation.
_C = tuple(
    np.float32(c)
    for c in (
        7.978606636e-01,
        3.637051076e-02,
        -4.755116162e-05,
        -5.336581080e-05,
        3.976416616e-06,
        -1.522087727e-07,
        3.107470242e-09,
        -2.664015293e-11,
    )
)
_CLAMP = np.float32(5.0)


def gelu_fitted(x: jax.Array) -> jax.Array:
    """Fitted tanh-form exact GELU; fp32 internal math, one final rounding."""
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -_CLAMP, _CLAMP)
    x2 = xc * xc
    u = _C[-1]
    for c in _C[-2::-1]:
        u = c + x2 * u
    u = xc * u
    # sigmoid(2u) == 0.5 * (1 + tanh(u)) exactly, but without the 1 + tanh
    # cancellation that costs ~half the fp32 bits as u -> -inf.
    out = xf * jax.nn.sigmoid(np.float32(2.0) * u)
    # Gaussian tail below the clamp: correctly-rounded |gelu| <= 1.3e-6 there;
    # flush to 0 (matching the tail limit; also fixes gelu(-inf) = NaN).
    out = jnp.where(xf < -_CLAMP, np.float32(0.0), out)
    return out.astype(x.dtype)


def _mode() -> str:
    mode = os.environ.get("MMMM_GELU", "")
    if mode:
        return mode
    if os.environ.get("MMMM_FAST_GELU", "0") == "1":  # legacy serving knob
        return "tanh"
    return "auto"


def gelu(x: jax.Array) -> jax.Array:
    """Exact-GELU dispatcher (drop-in for ``jax.nn.gelu(approximate=False)``).

    bf16 inputs route to :func:`gelu_fitted` (strictly more accurate AND
    faster than the erf chain — see module docstring); other dtypes keep the
    plain erf form, whose fp32 accuracy the fit does not dominate.
    """
    mode = _mode()
    if mode == "tanh":
        return jax.nn.gelu(x, approximate=True)
    if mode == "fitted" or (mode == "auto" and x.dtype == jnp.bfloat16):
        return gelu_fitted(x)
    return jax.nn.gelu(x, approximate=False)

#!/usr/bin/env python
"""One-shot on-chip exhaustive bf16 GELU sweep (ADVICE r3: the 65536-value
correct-rounding verification in tests/test_gelu.py runs on CPU; run it once
on the TPU and record the result in ROADMAP)."""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from mmmm_tpu.ops.gelu import gelu_fitted

MIN_NORMAL = 1.1754944e-38


def main():
    from scipy.special import erf

    bits = np.arange(65536, dtype=np.uint16)
    x = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.bfloat16)
    x64 = np.asarray(x, np.float64)
    finite = np.isfinite(x64)
    xb = np.asarray(x)[finite]
    x64 = x64[finite]
    true = x64 * 0.5 * (1.0 + erf(x64 / np.sqrt(2.0)))
    ref = np.asarray(jnp.asarray(true).astype(jnp.bfloat16))
    got = np.asarray(jax.jit(gelu_fitted)(jnp.asarray(xb)))  # ON CHIP
    tail = x64 < -5.0
    flushable = (np.abs(x64) < MIN_NORMAL) | (np.abs(true) < MIN_NORMAL)
    main_rng = ~tail & ~flushable
    mism = int((got[main_rng] != ref[main_rng]).sum())
    g64 = got.astype(np.float64)[main_rng]
    r64 = ref.astype(np.float64)[main_rng]
    step = 2.0 ** (np.floor(np.log2(np.abs(r64) + 1e-300)) - 7)
    max_steps = float((np.abs(g64 - r64) / step).max())
    print(json.dumps({
        "probe": "gelu_fitted_onchip_sweep",
        "platform": str(jax.devices()[0]),
        "main_range_mismatches_vs_correct_rounding": mism,
        "max_error_bf16_grid_steps": round(max_steps, 3),
        "tail_flush_ok": bool((g64 is not None) and np.all(got[tail] == 0.0)),
    }))


if __name__ == "__main__":
    main()

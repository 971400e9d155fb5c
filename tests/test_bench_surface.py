"""Guard the bench.py API surface that on-chip probe scripts call.

The probes (scripts/tpu_probes.py, scripts/bench_stages.py) can only RUN on
the real chip, so a bench.py refactor that renames a builder breaks them
silently until chip time is spent discovering it (this happened in round 4:
probe_stages still called the removed ``bench.build``). This test statically
walks each probe script's AST for ``bench.<name>`` attribute reads and
asserts the names exist, and sanity-checks the builder signatures bind.
"""
from __future__ import annotations

import ast
import inspect
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _bench_attr_reads(path: Path) -> set[str]:
    tree = ast.parse(path.read_text())
    names = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Attribute)
            and isinstance(node.value, ast.Name)
            and node.value.id == "bench"
        ):
            names.add(node.attr)
    return names


def test_probe_scripts_reference_existing_bench_names():
    import bench

    for script in ("scripts/tpu_probes.py", "scripts/bench_stages.py"):
        for name in _bench_attr_reads(ROOT / script):
            assert hasattr(bench, name), f"{script} references bench.{name}"


def test_probe_monkeypatch_targets_exist():
    """The bisect probes ablate components by setattr on module-level names
    resolved at trace time (probe_decode_bisect, probe_prefill_bisect); a
    rename in the model/ops modules would make a patch silently do nothing
    and the probe would report 'no cost' for a component that still runs."""
    import mmmm_tpu.models.cogvlm.decoder as dec_mod
    import mmmm_tpu.models.cogvlm.vit as vit_mod
    import mmmm_tpu.models.generate as gen_mod
    import mmmm_tpu.ops.decode_kernel as dk_mod

    # probe_prefill_bisect
    for mod, attr in [
        (vit_mod, "_gelu"),
        (vit_mod, "segment_attention"),
        (vit_mod, "variable_patch_embed_3d"),
        (vit_mod, "vit_forward"),
        (dec_mod, "segment_attention"),
        (dec_mod, "llm_forward"),
    ]:
        assert hasattr(mod, attr), f"{mod.__name__}.{attr} (prefill bisect)"
    # probe_decode_bisect
    for mod, attr in [
        (dk_mod, "decode_attention_pallas"),
        (dec_mod, "decode_attention_bhsd"),
        (dec_mod, "qdot"),
        (gen_mod, "qdot"),
        (dec_mod, "rms_norm"),
        (dec_mod, "apply_rope"),
    ]:
        assert hasattr(mod, attr), f"{mod.__name__}.{attr} (decode bisect)"


def test_bench_builder_signatures_bind():
    import bench

    # the call shapes the probes use — keep in sync with scripts/*
    inspect.signature(bench.build_prefill).bind("params", "cfg", 28)
    inspect.signature(bench.build_run).bind(
        "params", "cfg", "tok", 28, 128, "bf16", 0
    )
    inspect.signature(bench.build_params).bind()


def test_spawn_gauge_parses_last_json_line(monkeypatch):
    """bench.main orchestrates per-gauge subprocesses (one fresh device
    client per row — VERDICT r4 #2); _spawn_gauge must take the LAST stdout
    line (children may print progress first) and fall back to a retry then an
    {"error": ...} row instead of raising."""
    import subprocess
    import types

    import bench

    calls = []

    def fake_run(cmd, **kw):
        calls.append(kw["env"]["MMMM_BENCH_GAUGE"])
        return types.SimpleNamespace(
            returncode=0, stderr="",
            stdout='warmup noise\n{"value": 1.5, "mfu": 0.3}\n',
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    row = bench._spawn_gauge("headline")
    assert row == {"value": 1.5, "mfu": 0.3}
    assert calls == ["headline"]


def test_spawn_gauge_returns_error_row_after_retries(monkeypatch):
    import subprocess
    import types

    import bench

    def fake_run(cmd, **kw):
        return types.SimpleNamespace(
            returncode=1, stderr="RESOURCE_EXHAUSTED: boom", stdout="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_wait_for_backend", lambda *_: None)
    row = bench._spawn_gauge("spec", retries=1)
    assert "error" in row and "RESOURCE_EXHAUSTED" in row["error"]


def test_gauge_registry_complete():
    import bench

    # "greedy" (r5): the greedy control row spawned when the headline runs
    # speculative decode (the r5 default); same gauge fn, spec disabled via
    # the child env in _spawn_gauge
    assert set(bench._GAUGES) == {"headline", "greedy", "long", "spec",
                                  "prefill"}
    assert bench._GAUGES["greedy"] is bench._GAUGES["headline"]

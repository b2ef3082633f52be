"""Level-spec parsing for the scaling bench (pure driver-side logic)."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "scaling_bench",
    os.path.join(os.path.dirname(__file__), "..", "tools", "scaling_bench.py"))
sb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sb)


def test_total_cores_and_labels():
    assert sb._total_cores("16") == 16
    assert sb._total_cores("4x4") == 16
    assert sb._total_cores("1x4") == 4
    assert sb._label("8") == "local[8]"
    assert sb._label("2x3") == "local-cluster[2 execs × 3 cores]"


def test_efficiency_pairs_respect_mode():
    # pairs require exactly 4x the cores AND the same mode — a local[]
    # level must never pair with a local-cluster level
    levels = ("4", "16", "1x4", "4x4")
    pairs = [(lo, hi) for lo in levels for hi in levels
             if ("x" in lo) == ("x" in hi)
             and sb._total_cores(hi) == 4 * sb._total_cores(lo)]
    assert ("4", "16") in pairs and ("1x4", "4x4") in pairs
    assert ("4", "4x4") not in pairs and ("1x4", "16") not in pairs

"""The paired-adjudication script's auto-picker: pure function, no
Spark — guards the --auto path against rot (the whole point is that it
fires automatically on >threshold movers in future rounds)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench_isolated", Path(__file__).resolve().parents[1] / "scripts" / "bench_isolated.py"
)
bench_isolated = importlib.util.module_from_spec(_spec)
sys.modules["bench_isolated"] = bench_isolated
_spec.loader.exec_module(bench_isolated)


def _write(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries}))
    return str(p)


def test_pick_movers_selects_above_threshold_sorted_and_capped(tmp_path):
    old = _write(tmp_path, "old.json", {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0, "gone": 1.0})
    new = _write(tmp_path, "new.json", {"a": 1.31, "b": 2.0, "c": 1.29, "d": 1.5, "fresh": 9.9})
    # b (2.0x) then d (1.5x) then a (1.31x); c under threshold; 'fresh'
    # has no old reading and 'gone' no new one — both ignored
    got = bench_isolated._pick_movers(old, new, threshold=1.3, top=5)
    assert got == ["b", "d", "a"]
    # the cap trims from the tail (least-inflated first)
    assert bench_isolated._pick_movers(old, new, threshold=1.3, top=2) == ["b", "d"]


def test_pick_movers_empty_when_nothing_moves(tmp_path, capsys):
    old = _write(tmp_path, "old.json", {"a": 1.0})
    new = _write(tmp_path, "new.json", {"a": 1.05})
    assert bench_isolated._pick_movers(old, new, threshold=1.3, top=5) == []
    assert "nothing to adjudicate" in capsys.readouterr().out


def test_pick_movers_ignores_zero_old_timings(tmp_path):
    old = _write(tmp_path, "old.json", {"a": 0.0, "b": 1.0})
    new = _write(tmp_path, "new.json", {"a": 5.0, "b": 5.0})
    assert bench_isolated._pick_movers(old, new, threshold=1.3, top=5) == ["b"]

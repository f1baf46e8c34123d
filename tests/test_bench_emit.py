"""bench.py's artifact contract (VERDICT r03: one crashing gate destroyed
the round-3 headline JSON).  Pure-host: no device work — bench's module
scope only defines helpers."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _capture_emit(payload, capsys):
    import bench

    bench._emit(payload)
    return capsys.readouterr().out.strip().splitlines()[-1]


def test_emit_bounds_line_and_keeps_error_excerpts(capsys):
    """A mass-failure payload (15 gates x bounded error strings) must
    still land as ONE parseable line under the capture budget, with a
    truncated error excerpt surviving the trim — the diagnosis must
    live in the line of record, not in driver-truncated stderr."""
    import bench

    boom = "XlaRuntimeError: " + "y" * 180  # gate_config's 200-char bound
    payload = {"metric": "m", "value": 1.0, "unit": "t/s",
               "vs_baseline": 1.0,
               "configs": [{"name": f"g{i}", "checked": 9, "ok": False,
                            "agree": 0.5, "error": boom,
                            "extra_detail": "z" * 300}
                           for i in range(15)]}
    line = _capture_emit(payload, capsys)
    assert len(line) <= bench._MAX_LINE
    out = json.loads(line)
    assert out["value"] == 1.0 and out["configs_trimmed"]
    assert len(out["configs"]) == 15
    assert all(c["error"].startswith("XlaRuntimeError") and
               len(c["error"]) <= 60 for c in out["configs"])
    assert "extra_detail" not in json.dumps(out)


def test_emit_small_payload_untouched(capsys):
    payload = {"metric": "m", "value": 2.0,
               "configs": [{"name": "g", "checked": 3, "ok": True,
                            "agree": 1.0}]}
    line = _capture_emit(payload, capsys)
    out = json.loads(line)
    assert out == payload and "configs_trimmed" not in out


def test_emit_drops_configs_when_still_too_long(capsys):
    payload = {"metric": "m", "value": 3.0,
               "configs": [{"name": "g%d" % i, "checked": 1, "ok": False,
                            "agree": 0.0, "error": "e" * 200}
                           for i in range(200)]}
    line = _capture_emit(payload, capsys)
    out = json.loads(line)
    assert "configs" not in out and out["configs_dropped"]
    assert out["value"] == 3.0

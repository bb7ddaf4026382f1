"""The turnkey re-validation runner (benchmarks/revalidate.py): JSON-line
collection, per-item subprocess isolation, and timeout handling — the
machinery must be trustworthy so a mid-queue device death still yields a
usable REVALIDATION.json."""

import json
import sys

from benchmarks.revalidate import parse_json_lines, run_item


def test_parse_json_lines_filters_noise():
    text = "\n".join([
        "compiling...",
        '{"metric": "a", "value": 1}',
        "{not json}",
        '  {"metric": "b", "value": 2.5}  ',
        "done",
    ])
    rows = parse_json_lines(text)
    assert [r["metric"] for r in rows] == ["a", "b"]


def test_parse_json_lines_recovers_indented_object():
    """quality_e2e prints ONE indented multi-line JSON object; earlier log
    lines containing braces must not derail the recovery."""
    text = "\n".join([
        'VAE: {"val_llh": 2266.4} (3256s)',   # braces inside a log line
        "LDM: loss 1.8 -> 0.5 (3593s)",
        json.dumps({"vae": {"val_llh": 2266.4}, "gen/r2_mean": 0.99}, indent=2),
    ])
    rows = parse_json_lines(text)
    assert len(rows) == 1 and rows[0]["gen/r2_mean"] == 0.99


def test_run_item_collects_metrics():
    cmd = [sys.executable, "-c",
           'import json; print("noise"); '
           'print(json.dumps({"metric": "x", "value": 3}))']
    item = run_item("demo", cmd, timeout_s=60)
    assert item["status"] == "ok"
    assert item["results"] == [{"metric": "x", "value": 3}]


def test_run_item_records_failure_with_stderr():
    cmd = [sys.executable, "-c", 'import sys; sys.exit("boom")']
    item = run_item("demo", cmd, timeout_s=60)
    assert item["status"] == "failed"
    assert "boom" in item["stderr_tail"]


def test_run_item_timeout_preserves_partial_output():
    cmd = [sys.executable, "-u", "-c",
           'import json, sys, time; '
           'print(json.dumps({"metric": "early", "value": 1}), flush=True); '
           'print("relay unreachable", file=sys.stderr, flush=True); '
           'time.sleep(60)']
    # generous timeout: under full-suite load on a 1-core host the child can
    # take seconds just to start, and the 'early' line must flush before kill
    item = run_item("demo", cmd, timeout_s=10)
    assert item["status"] == "timeout"
    assert [r["metric"] for r in item["results"]] == ["early"]
    # the one diagnostic that explains a wedge must survive the timeout
    assert "relay unreachable" in item["stderr_tail"]

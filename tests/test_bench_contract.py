"""bench.py output contract: the driver parses stdout for ONE compact
JSON line — r01 recorded ``"parsed": null`` when the line was
truncated, so the contract (full line first, short summary line last,
both valid JSON with the required keys) is pinned here on a 3-query
subset at sf0.001."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_parseable_json_contract():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_LIMIT="3",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) >= 2
    full = json.loads(lines[0])
    summary = json.loads(lines[-1])
    for payload in (full, summary):
        for key in ("metric", "value", "unit", "n_queries", "sec_per_query", "sf"):
            assert key in payload, (key, payload)
    assert full["n_queries"] == 3
    assert len(full["queries"]) == 3
    assert full["sf"] == 0.001
    assert summary["value"] == full["value"]


def test_bench_match_filter_and_arg_errors():
    """--match restricts to matching names; malformed --limit exits
    with a usage error instead of a traceback (ADVICE r02)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--match", "dedup_exact"],
        capture_output=True, text=True, env=env, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    full = json.loads(out.stdout.strip().splitlines()[0])
    # substring match: both dedup_exact and dedup_exact_substring qualify
    assert list(full["queries"]) == ["dedup_exact", "dedup_exact_substring"]

    for argv in (["--limit"], ["--limit", "xyz"]):
        bad = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *argv],
            capture_output=True, text=True, env=env, timeout=120, cwd=REPO,
        )
        assert bad.returncode != 0
        assert "usage:" in (bad.stderr + bad.stdout)
        assert "Traceback" not in bad.stderr

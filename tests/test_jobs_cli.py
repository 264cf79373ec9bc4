"""Smoke tests for the spark-submit CLI entrypoints (SURVEY §2 S10 — the
reference's CLI dump analog). Runs each job as a real subprocess so the
argument parsing, session bootstrap, store handoff, and JSON report
contract are all exercised end to end."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_encode_then_decode_cli(tmp_path):
    store = str(tmp_path / "store")
    enc = _run(
        [
            "jobs/encode_job.py",
            "--synthetic-rows", "2000",
            "--store", store,
            "--target-mb", "4",
        ]
    )
    assert enc["rows"] == 2000 and enc["partitions_encoded"] >= 1
    assert enc["enc_bytes"] < enc["raw_bytes"]
    # resume rerun is a no-op: everything already committed
    enc2 = _run(
        ["jobs/encode_job.py", "--synthetic-rows", "2000", "--store", store, "--target-mb", "4"]
    )
    assert enc2["partitions_encoded"] == 0

    out = str(tmp_path / "decoded.parquet")
    dec = _run(["jobs/decode_job.py", "--store", store, "--out", out])
    assert dec["rows"] == 2000 and dec["out"] == out

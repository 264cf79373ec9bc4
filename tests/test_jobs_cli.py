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


def test_maintenance_cli(tmp_path):
    """The maintenance surface as a real subprocess: fragment-encode →
    delete via CLI → compact via CLI (purges the delete) → gc → snapshot,
    each reporting its JSON contract line."""
    store = str(tmp_path / "store")
    _run(
        [
            "jobs/encode_job.py",
            "--synthetic-rows", "1500",
            "--store", store,
            "--target-mb", "1",
        ]
    )
    dele = _run(["jobs/maintenance_job.py", "delete", store, "repo", "==", "org0/megarepo"])
    assert dele["committed"] and dele["rows_deleted"] > 0
    dst = str(tmp_path / "compacted")
    comp = _run(["jobs/maintenance_job.py", "compact", store, dst, "32"])
    assert comp["n_values"] > 0
    from parzig_spark.plans.manifest import ManifestStore

    assert ManifestStore(dst).committed_delete_ops() == []
    gc = _run(["jobs/maintenance_job.py", "gc", dst])
    assert gc["cmd"] == "gc"
    snap = _run(["jobs/maintenance_job.py", "snapshot", dst])
    assert os.path.exists(snap["path"])
    snaps = _run(["jobs/maintenance_job.py", "snapshots", dst])
    latest = max(s["version"] for s in snaps["snapshots"])
    rb = _run(["jobs/maintenance_job.py", "rollback", dst, str(latest)])
    assert rb["retired_partitions"] == 0  # target is already the current view


def test_spark_submit_pyfiles_deploy(tmp_path):
    """The north rule's deployment shape, end to end: package the library
    with jobs/package_pyfiles.sh and run the encode job via real
    spark-submit --py-files from a cwd where ``parzig_spark`` is NOT
    importable except through the shipped zip — catching any module the
    packaging script misses."""
    import shutil

    subprocess.run(
        ["bash", "jobs/package_pyfiles.sh"], check=True, cwd=REPO, capture_output=True
    )
    job = shutil.copy(
        os.path.join(REPO, "jobs", "encode_job.py"), tmp_path / "encode_job.py"
    )
    store = str(tmp_path / "store")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "parzig_spark.zip"),
            str(job),
            "--synthetic-rows", "1000",
            "--store", store,
            "--target-mb", "4",
        ],
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
        cwd=str(tmp_path),
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["rows"] == 1000 and rep["partitions_encoded"] >= 1

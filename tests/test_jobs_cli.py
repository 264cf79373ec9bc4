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


def test_wap_cli_lifecycle(tmp_path):
    """The WAP gate as CLI steps: encode → write a batch parquet → stage →
    refs listed → audit green → check gate (exit 1 on violation, 0 after
    narrowing) → publish → head decode sees the batch."""
    store = str(tmp_path / "store")
    _run(
        [
            "jobs/encode_job.py",
            "--synthetic-rows", "1200",
            "--store", store,
            "--target-mb", "1",
        ]
    )
    # the synthetic corpus generator is deterministic by row id: rows
    # 1200..1500 are a disjoint, same-schema batch
    batch = str(tmp_path / "batch.parquet")
    gen = subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0, %r); "
            "from parzig_spark.session import get_spark; "
            "from parzig_spark.sources import source_code_table; "
            "spark = get_spark(master='local[4]'); "
            "import pyspark.sql.functions as F; "
            "full = source_code_table(spark, n_rows=1500, partitions=4); "
            "full.filter(F.xxhash64('path','commit') %% 5 == 0)"
            ".write.mode('overwrite').parquet(%r)" % (REPO, batch),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    info = _run(["jobs/maintenance_job.py", "stage", store, batch, "cli-wap-1"])
    assert info["rows_staged"] > 0
    refs = _run(["jobs/maintenance_job.py", "refs", store])
    assert refs["refs"][0]["name"] == info["branch"]
    audit = _run(["jobs/maintenance_job.py", "audit", store, info["branch"]])
    assert audit["corrupt_blobs"] == 0
    # gate: the staged view has more rows than the head allows → exit 1
    gate = subprocess.run(
        [
            sys.executable, "jobs/maintenance_job.py", "check", store,
            json.dumps([["row_count_between", None, [1, 1]]]), info["branch"],
        ],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert gate.returncode == 1
    ok = _run(
        [
            "jobs/maintenance_job.py", "check", store,
            json.dumps([["row_count_between", None, [1, 10_000]],
                        ["no_nulls", "path", None]]),
            info["branch"],
        ]
    )
    assert all(r["passed"] for r in ok["results"])
    pub = _run(["jobs/maintenance_job.py", "publish", store, info["branch"]])
    assert pub["published_version"] >= 1
    assert _run(["jobs/maintenance_job.py", "refs", store])["refs"] == []

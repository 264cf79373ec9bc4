"""Unit tests for the training-data operators (dedup, similarity, text,
multimodal) on planted fixtures with known answers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parzig_spark.functions import dedup as ded
from parzig_spark.functions import multimodal as mm
from parzig_spark.functions import similarity as sim
from parzig_spark.functions import text as tx

DOC = (
    "The quick brown fox jumps over the lazy dog. "
    "Compression engines pack columns into small encoded blobs. "
) * 20


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        rows.append((i, DOC + f"unique tail {rng.integers(1e9)}"))
    # planted near-dup pair: identical except one word
    rows.append((100, DOC + "unique tail SAME"))
    rows.append((101, DOC.replace("lazy", "sleepy") + "unique tail SAME"))
    # planted exact dup pair (after whitespace normalization)
    rows.append((200, "exactly  the same\ttext"))
    rows.append((201, "exactly the same text"))
    # unrelated
    rows.append((300, "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 2000))))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_dedup_exact_normalized(spark, docs):
    kept = ded.dedup_exact(docs, "text", "doc_id")
    ids = {r["doc_id"] for r in kept.collect()}
    assert 200 in ids and 201 not in ids  # normalized dup dropped, keeper=min


def test_minhash_finds_planted_near_dup(spark, docs):
    pairs = ded.minhash_lsh_candidates(docs, "text", "doc_id")
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert (100, 101) in got
    verified = ded.ngram_jaccard(docs, pairs, "text", "doc_id")
    j = {(r["key_a"], r["key_b"]): r["jaccard"] for r in verified.collect()}
    assert j[(100, 101)] > 0.8
    # unrelated high-entropy doc must pair with nothing
    assert not any(300 in p for p in got)


def test_simhash_hamming(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in ded.simhash(docs, "text", "doc_id").collect()}
    def ham(a, b):
        return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")
    assert ham(sh[100], sh[101]) <= 6
    assert ham(sh[100], sh[300]) > 10


def test_embedding_near_dups_planted(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 32)).astype(np.float32)
    vecs[42] = vecs[7] + rng.normal(scale=0.01, size=32).astype(np.float32)  # near-dup
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = ded.embedding_near_dups(df, threshold=0.95, n_planes=4)
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert (7, 42) in got


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    got = [r["vec_id"] for r in sim.cosine_topk(df.filter("vec_id != 0"), q, k=10).collect()]
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit[1:] @ unit[0]
    expect = (np.argsort(-sims)[:10] + 1).tolist()
    assert got == expect


def test_lsh_topk_recall(spark):
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(500, 16)).astype(np.float32)
    vecs[77] = vecs[0] * 1.001  # planted exact neighbor
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    indexed = sim.lsh_index(df.filter("vec_id != 0"), n_planes=6)
    got = [r["vec_id"] for r in sim.lsh_topk(indexed, vecs[0].tolist(), k=5, n_planes=6).collect()]
    assert got[0] == 77  # the planted neighbor must be ranked first


def test_text_stats_edges(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two  three\nfour"), (4, "héllo 🚀")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in tx.text_stats(df, "text", ["doc_id"]).collect()}
    assert got[1]["n_tokens"] == 0 and got[2]["n_tokens"] == 0
    assert got[3]["n_tokens"] == 4 and got[3]["n_lines"] == 2
    assert got[4]["n_bytes"] > got[4]["n_chars"]  # multibyte utf-8


def test_lang_id_on_snippets(spark):
    df = spark.createDataFrame(
        [
            (1, "def main():\n    return [x for x in range(10)]\nimport os\n" * 5),
            (2, '{"name": "pkg", "version": "1.0.0", "dependencies": {"a": "2"}}'),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in tx.lang_id(df, "text", ["doc_id"]).collect()}
    assert got[1] == "python"
    assert got[2] == "json"


def test_multimodal_sniff_and_stub(spark):
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 100
    assert mm.sniff_format(png) == "png"
    assert mm.sniff_format(b"") == "empty"
    with pytest.raises(NotImplementedError):
        mm.decode_media(png, fake=False)
    feats = mm.decode_media(png, fake=True)
    assert feats.shape == (16,) and abs(feats.sum() - 1.0) < 1e-5

    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(b"plain"))], "doc_id long, data binary")
    out = {r["doc_id"]: r for r in mm.extract_features(df, "data", ["doc_id"]).collect()}
    assert out[1]["format"] == "png" and len(out[1]["feature"]) == 16
    meta = {r["doc_id"]: r for r in mm.media_metadata(df, "data", ["doc_id"]).collect()}
    assert meta[1]["n_bytes"] == len(png)
    assert meta[1]["magic_hex"].startswith("89504e47")


def test_lsh_index_partition_pruning_and_recall(spark, tmp_path):
    """The materialized LSH index prunes bucket partitions at the source
    (PartitionFilters on `bucket`), and a planted near-duplicate of the
    query lands in the ANN top-k."""
    import numpy as np
    from pyspark.sql import functions as F

    from parzig_spark.functions import similarity as sim

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    query = vecs[0].tolist()
    planted = (vecs[0] + rng.normal(scale=1e-3, size=16).astype(np.float32)).tolist()
    rows = [(i + 1, [float(x) for x in vecs[i]]) for i in range(300)]
    rows.append((999, [float(x) for x in planted]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "lshidx")
    sim.build_lsh_index(df, path, n_planes=6, dim=16)

    probe = sim.lsh_topk_indexed(spark, path, query, k=10, n_planes=6, radius=1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:2000]
    got = probe.collect()
    keys = [r["vec_id"] for r in got]
    assert 999 in keys, keys  # planted near-dup recalled
    assert keys[0] in (1, 999)  # query itself (vec_id=1) or its twin on top


def test_multimodal_resize_and_frame_sample_plumbing(spark):
    """Stubbed decode, REAL Spark plumbing: constant-size resize output and
    1:N frame explode with deterministic content."""
    from pyspark.sql import functions as F

    from parzig_spark.functions import multimodal as mm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    as_bin = docs.select("doc_id", F.encode("text", "utf-8").alias("data"))

    resized = mm.resize_images(as_bin, "data", ["doc_id"], width=8, height=8).collect()
    assert len(resized) == 50
    assert all(len(r["resized"]) == 64 for r in resized)

    frames = mm.sample_frames(as_bin, "data", ["doc_id"], n_frames=3, frame_bytes=64)
    out = frames.collect()
    assert len(out) == 150  # 1:N explode
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["frame_idx"])
    assert all(v == {0, 1, 2} for v in by_doc.values())
    # determinism: same input → same frames
    out2 = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in frames.collect()}
    for r in out:
        assert out2[(r["doc_id"], r["frame_idx"])] == bytes(r["frame"])


def test_embedding_near_dups_zero_vector_no_nan_pairs(spark):
    """Regression: a zero-norm vector produced 0/0 = NaN cosine, and Spark
    orders NaN above every number, so NaN >= threshold emitted spurious
    pairs; the nullif guard must drop them instead."""
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = ded.embedding_near_dups(df, "embedding", "vec_id", threshold=0.9, n_planes=2, dim=4)
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert (0, 1) not in got  # zero-vector pair must not surface as NaN
    assert (2, 3) in got  # identical real vectors still match


def test_ivf_index_partition_pruning_and_recall(spark, tmp_path):
    """The materialized IVF index prunes cluster partitions at the source
    (PartitionFilters on `cluster`), the quantizer is deterministic, and a
    planted near-duplicate of the query lands in the ANN top-k."""
    import numpy as np

    from parzig_spark.functions import similarity as sim

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    query = vecs[0].tolist()
    planted = (vecs[0] + rng.normal(scale=1e-3, size=16).astype(np.float32)).tolist()
    rows = [(i + 1, [float(x) for x in vecs[i]]) for i in range(300)]
    rows.append((999, [float(x) for x in planted]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivfidx")
    sim.build_ivf_index(df, path, k_clusters=8, sample_limit=128)

    # quantizer determinism: same sample rows -> bit-identical centroids
    mat = np.array([r[1] for r in rows[:128]], dtype=np.float64)
    c1 = sim.ivf_centroids(mat, 8)
    c2 = sim.ivf_centroids(mat, 8)
    assert (c1 == c2).all()

    probe = sim.ivf_topk_indexed(spark, path, query, k=10, nprobe=3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan, plan[:2000]
    keys = [r["vec_id"] for r in probe.collect()]
    # query (vec_id=1) and its planted twin share a cell by construction
    assert 1 in keys and 999 in keys, keys
    assert keys[0] in (1, 999)


def test_dedup_components_chains_and_singletons(spark):
    """Min-label propagation: a 4-node chain collapses to its min key in
    diameter rounds, singletons keep their own key, two disjoint clusters
    stay disjoint."""
    from parzig_spark.functions.dedup import dedup_components

    keys = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # chain 1-2-3-4 (diameter 3), pair 7-9, singletons 0,5,6,8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 9)], "key_a long, key_b long"
    )
    got = {
        r["doc_id"]: r["group_id"]
        for r in dedup_components(keys, pairs, "doc_id").collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 7, 8: 8, 9: 7}


def test_dedup_components_nonconvergence_guard(spark):
    import pytest

    from parzig_spark.functions.dedup import dedup_components

    keys = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "key_a long, key_b long"
    )
    # diameter 5 > max_iters 2 -> must fail loudly, not return a wrong fixpoint
    with pytest.raises(RuntimeError, match="converge"):
        dedup_components(keys, chain, "doc_id", max_iters=2)
    # and converges fine with the default budget
    got = {
        r["doc_id"]: r["group_id"]
        for r in dedup_components(keys, chain, "doc_id").collect()
    }
    assert set(got.values()) == {0}


def test_sessionize_gap_boundaries(spark):
    """Planted gaps: events 31 min apart split sessions, 29 min apart don't;
    numbering restarts per user."""
    from datetime import datetime, timedelta

    from parzig_spark.functions.events import session_stats, sessionize

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: a 3-event session, a 31-min gap, then 2 more events
        (0, t0, 1, 1.0),
        (1, t0 + timedelta(minutes=10), 1, 2.0),
        (2, t0 + timedelta(minutes=39), 1, 3.0),  # 29 min after prev: same
        (3, t0 + timedelta(minutes=71), 1, 4.0),  # 32 min: NEW session
        (4, t0 + timedelta(minutes=72), 1, 5.0),
        # user 2: one event
        (5, t0, 2, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        r["event_id"]: r["session_no"]
        for r in sessionize(df).select("event_id", "session_no").collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    stats = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["duration_us"])
        for r in session_stats(df).collect()
    }
    assert stats[(1, 1)] == (3, 39 * 60 * 1_000_000)
    assert stats[(1, 2)] == (2, 60 * 1_000_000)
    assert stats[(2, 1)] == (1, 0)


def test_hash_sample_deterministic_and_stratified(spark):
    from parzig_spark.functions.text import hash_sample

    docs = spark.range(0, 4000).selectExpr("id AS doc_id", "id % 5 AS lang")
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs.repartition(7), "doc_id").collect()}
    assert a == b  # partitioning-independent
    frac = len(a) / 4000
    assert 0.2 < frac < 0.3  # ~4/16
    # every stratum sampled at a similar rate
    per = (
        hash_sample(docs, "doc_id").groupBy("lang").count().collect()
    )
    for r in per:
        assert 0.15 < r["count"] / 800 < 0.35


def test_embedding_near_dups_matches_expression_form(spark):
    """The round-6 vectorized pair kernel must be BIT-identical to the
    original Catalyst aggregate(zip_with(...)) join form — same pairs, same
    cosine doubles — including zero vectors, duplicate vectors, and a low
    threshold that makes most pairs candidates."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    vecs[7] = vecs[3] + rng.normal(scale=0.001, size=16).astype(np.float32)
    vecs[50] = vecs[51]  # exact duplicate
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    rows.append((500, [0.0] * 16))  # zero vector
    rows.append((501, [0.0] * 16))
    # shorter vectors: only equal-length rows can pair (zip_with pads the
    # shorter side with null -> null cosine); 600/601 are near-identical
    short = rng.normal(size=8).astype(np.float32)
    rows.append((600, short.tolist()))
    rows.append((601, (short + 0.001).astype(np.float32).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def expression_form(df, vec_col, key_col, threshold, n_planes, seed, dim):
        norm = F.sqrt(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        bucketed = sim.lsh_index(df, vec_col, key_col, n_planes, seed, dim).withColumn("_norm", norm)
        left, right = bucketed.alias("l"), bucketed.alias("r")
        cos = F.round(
            F.aggregate(
                F.zip_with(
                    F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"),
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.nullif(F.col("l._norm") * F.col("r._norm"), F.lit(0.0)),
            6,
        )
        return (
            left.join(
                right,
                (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")),
            )
            .select(
                F.col(f"l.{key_col}").alias("key_a"),
                F.col(f"r.{key_col}").alias("key_b"),
                cos.alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    for threshold in (0.95, 0.2, -0.5):
        got = {
            (r["key_a"], r["key_b"], r["cosine"])
            for r in ded.embedding_near_dups(
                df, "embedding", "vec_id", threshold=threshold, n_planes=3, dim=16
            ).collect()
        }
        want = {
            (r["key_a"], r["key_b"], r["cosine"])
            for r in expression_form(
                df, "embedding", "vec_id", threshold, 3, 42, 16
            ).collect()
        }
        assert got == want, f"threshold={threshold}: {got ^ want}"


def test_lsh_index_matches_catalyst_fold(spark):
    """Round-6 vectorized lsh_index must assign bit-identical buckets to
    the Catalyst aggregate(zip_with(...)) expression form, including NaN
    elements (Spark: NaN dot > 0 is TRUE), null elements (null dot -> bit
    0), null vecs, and length-mismatched vecs."""
    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(size=16).astype(np.float32).tolist()) for i in range(200)]
    rows.append((900, None))
    rows.append((901, [float("nan")] * 16))
    v = rng.normal(size=16).astype(np.float32).tolist()
    v[3] = None
    rows.append((902, v))
    rows.append((903, rng.normal(size=8).astype(np.float32).tolist()))  # short
    rows.append((904, [float("inf"), float("-inf")] + [0.0] * 14))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = sim.hyperplanes(16, 5, 42)
    want = {
        (r["vec_id"], r["bucket"])
        for r in df.select("vec_id", "embedding")
        .withColumn("bucket", sim.bucket_expr("embedding", planes))
        .collect()
    }
    got = {
        (r["vec_id"], r["bucket"])
        for r in sim.lsh_index(df, "embedding", "vec_id", 5, 42, 16).collect()
    }
    assert got == want, got ^ want

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design: every variant is shuffle-bounded by (bucket, band) keys, never
all-pairs. Exact dedup is a hash groupBy; MinHash/SimHash bucket first and
compare only within buckets, so the worst case is the largest bucket, not
n². Signatures are computed in Arrow-vectorized pandas UDFs (numpy matrix
ops, no per-row Python hashing).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1


def dedup_exact(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-key row per exact (md5-normalized) duplicate group."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    fp = df.withColumn("fp", F.md5(normalized))
    w = Window.partitionBy("fp").orderBy(F.col(key_col))
    return (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _char_shingles(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Each doc → array of uint64 rolling hashes of its k-char shingles."""
    out = []
    for t in texts:
        b = np.frombuffer((t or "").encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if len(b) < k:
            out.append(np.zeros(1, dtype=np.uint64))
            continue
        windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        mult = np.uint64(31) ** np.arange(k, dtype=np.uint64)
        out.append((windows * mult).sum(axis=1))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(key, signature array<long>) via k-char shingles + universal hashing."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.uint64)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shingles = _char_shingles(pdf[text_col], shingle_k)
            sigs = []
            for sh in shingles:
                # (n_hashes, n_shingles) universal hash, min per row.
                hashed = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
                sigs.append(hashed.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({key_col: pdf[key_col], "signature": sigs})

    key_type = dict(df.dtypes)[key_col]
    return df.select(key_col, text_col).mapInPandas(
        sig, schema=f"{key_col} {key_type}, signature array<long>"
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    max_bucket: int = 256,
) -> DataFrame:
    """Candidate near-dup pairs: band the signature, self-join on band hash.

    Shuffles on (band, band_hash) — co-located, no all-pairs; per-bucket
    membership capped at ``max_bucket`` so pathological duplicate clusters
    stay O(k·max_bucket), not O(k²). Returns (key_a, key_b, n_shared_bands)
    with key_a < key_b.
    """
    sigs = minhash_signatures(df, text_col, key_col, n_hashes, shingle_k, seed)
    rows_per_band = n_hashes // bands
    banded = sigs.select(
        key_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(F.col("signature"), i * rows_per_band + 1, rows_per_band).cast("string")
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # Scale guard: a bucket of k near-identical docs yields k^2 pairs. Cap
    # bucket size — giant exact-dup clusters are exact-dedup's job (hash
    # groupBy, linear), LSH is for the near-dup tail. The window ranks
    # within (band, bucket) so the cap keeps a deterministic subset.
    w = Window.partitionBy("band", "band_hash").orderBy(F.col(key_col))
    banded = (
        banded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")),
        )
        .select(
            F.col(f"l.{key_col}").alias("key_a"),
            F.col(f"r.{key_col}").alias("key_b"),
        )
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verification stage).

    Joins the texts onto the (small) candidate set — broadcast when small —
    then computes set Jaccard vectorized per batch.
    """
    texts = df.select(F.col(key_col), F.col(text_col))
    joined = (
        pairs.join(texts.withColumnsRenamed({key_col: "key_a", text_col: "_ta"}), "key_a")
        .join(texts.withColumnsRenamed({key_col: "key_b", text_col: "_tb"}), "key_b")
    )

    def jac(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sa = _char_shingles(pdf["_ta"], shingle_k)
            sb = _char_shingles(pdf["_tb"], shingle_k)
            sims = []
            for x, y in zip(sa, sb):
                ux, uy = np.unique(x), np.unique(y)
                inter = len(np.intersect1d(ux, uy, assume_unique=True))
                union = len(ux) + len(uy) - inter
                sims.append(inter / union if union else 1.0)
            out = pdf[["key_a", "key_b"]].copy()
            out["jaccard"] = sims
            yield out

    kt = dict(pairs.dtypes)["key_a"]
    return joined.mapInPandas(jac, schema=f"key_a {kt}, key_b {kt}, jaccard double")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_k: int = 4,
) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of shingle-hash bit vectors."""

    def sh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shingles = _char_shingles(pdf[text_col], shingle_k)
            out_hash = []
            for s in shingles:
                h = (s * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
                bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
                votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(s)  # (64,)
                word = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
                out_hash.append(int(word.view("<u8")[0].astype(np.int64)))
            yield pd.DataFrame({key_col: pdf[key_col], "simhash": out_hash})

    kt = dict(df.dtypes)[key_col]
    return df.select(key_col, text_col).mapInPandas(sh, schema=f"{key_col} {kt}, simhash long")


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH buckets.

    Pairs are only compared within a bucket (expected bucket size
    n/2^planes) through a self-equi-join on the bucket key — co-partitioned
    shuffle, never all-pairs, the 100-TB-safe shape. Bucketing and the
    exact cosine verification are pure Catalyst expressions (JVM codegen,
    no Python workers, and DuckDB-oracleable bit-for-bit).
    """
    from .similarity import _cosine_expr, lsh_index

    bucketed = lsh_index(df, vec_col, key_col, n_planes, seed, dim)
    left = bucketed.alias("l")
    right = bucketed.alias("r")
    cos = F.round(
        F.aggregate(
            F.zip_with(
                F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(F.aggregate(
                F.transform(F.col(f"l.{vec_col}"), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0), lambda acc, x: acc + x))
            * F.sqrt(F.aggregate(
                F.transform(F.col(f"r.{vec_col}"), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0), lambda acc, x: acc + x))
        ),
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

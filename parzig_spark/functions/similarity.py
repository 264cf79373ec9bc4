"""Similarity search over embedding columns (array<float>).

Two paths per the build brief:
- brute-force cosine top-k — fully declarative (zip_with/aggregate, JVM
  codegen, no Python), the correctness baseline and DuckDB-oracleable;
- IVF-style bucketed ANN — random-hyperplane LSH routing with multi-probe,
  the 100-TB scale path: the query only scans matching buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine_expr(vec_col: str, qcol: str):
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col(qcol), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norm_q = F.sqrt(
        F.aggregate(
            F.transform(F.col(qcol), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm_v * norm_q)


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 20,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against a one-row query DataFrame.

    The query side is crossJoin-broadcast (one row); scoring is pure
    Catalyst expressions, so the scan stays column-pruned and codegen'd;
    the global top-k is a k-row sort (Spark TakeOrderedAndProject).
    """
    q = query.select(F.col(vec_col).alias("_q"))
    scored = df.crossJoin(F.broadcast(q)).select(
        F.col(key_col),
        F.round(_cosine_expr(vec_col, "_q"), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(key_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(n_planes, dim)).astype(np.float64)


def _bucket_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (mat @ planes.T) > 0
    codes = np.packbits(signs, axis=1, bitorder="little")
    padded = np.zeros((mat.shape[0], 8), dtype=np.uint8)
    padded[:, : min(8, codes.shape[1])] = codes[:, :8]
    return padded.view("<u8").reshape(-1).astype(np.int64)


def lsh_index(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Attach an LSH bucket id. At scale, write this out partitioned/bucketed
    by `bucket` so probes read only matching files (partition pruning)."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = first["d"] if first else 0
    planes = _hyperplanes(dim, n_planes, seed)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = pdf.copy()
            out["bucket"] = _bucket_codes(mat, planes)
            yield out

    kt, vt = dict(df.dtypes)[key_col], dict(df.dtypes)[vec_col]
    return df.select(key_col, vec_col).mapInPandas(
        assign, schema=f"{key_col} {kt}, {vec_col} {vt}, bucket long"
    )


def lsh_topk(
    indexed: DataFrame,
    query_vec: list[float],
    k: int = 20,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_planes: int = 10,
    seed: int = 42,
    n_probes: int = 8,
) -> DataFrame:
    """ANN top-k: scan only the query's bucket plus its n_probes nearest
    Hamming-neighbor buckets (multi-probe LSH)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)[None, :]
    base = int(_bucket_codes(q, planes)[0])
    probes = {base}
    margins = np.abs(q @ planes.T).reshape(-1)
    for bit in np.argsort(margins)[: max(0, n_probes - 1)]:
        probes.add(base ^ (1 << int(bit)))
    qdf = indexed.sparkSession.createDataFrame([(list(map(float, query_vec)),)], f"_q {dict(indexed.dtypes)[vec_col]}")
    candidates = indexed.filter(F.col("bucket").isin([int(p) for p in probes]))
    scored = candidates.crossJoin(F.broadcast(qdf)).select(
        F.col(key_col),
        F.round(_cosine_expr(vec_col, "_q"), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(key_col)).limit(k)

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


def _cumsum0(a: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a) + 1, dtype=np.int64)
    np.cumsum(a, out=out[1:])
    return out


def _shingle_hash_batch(texts: pd.Series, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch k-shingle rolling hashes — one flat kernel, no per-doc
    numpy calls (the old per-document loop was the minhash throughput
    ceiling on many-small-docs corpora).

    All documents' bytes are concatenated once; the rolling hash
    ``sum_j byte[j]*31^j`` is k vectorized multiply-adds over the whole
    concatenation; cross-document windows are dropped by a repeat/cumsum
    gather. Returns (hashes, offsets) where doc i's shingle hashes are
    ``hashes[offsets[i]:offsets[i+1]]`` (empty for docs shorter than k —
    callers substitute the legacy single 0-hash).
    """
    bufs = [(t or "").encode("utf-8", "surrogatepass") for t in texts]
    lens = np.fromiter((len(b) for b in bufs), np.int64, len(bufs))
    cnt = np.maximum(lens - k + 1, 0)
    offsets = _cumsum0(cnt)
    if offsets[-1] == 0:
        return np.zeros(0, dtype=np.uint64), offsets
    # Chunk over whole documents (~8 MB of bytes each) so the working
    # buffers stay allocator-recycled — this host faults fresh large
    # allocations in at ~100 MB/s (CLAUDE.md), so one giant pass would be
    # page-fault-bound while fixed-size chunks run at memory speed.
    cum = np.cumsum(lens)
    bounds = [0]
    while bounds[-1] < len(lens):
        done = int(cum[bounds[-1] - 1]) if bounds[-1] else 0
        nxt = int(np.searchsorted(cum, done + _SHINGLE_CHUNK_BYTES)) + 1
        bounds.append(min(max(nxt, bounds[-1] + 1), len(lens)))
    parts = [
        _shingle_hash_flat(bufs[s:e], lens[s:e], cnt[s:e], k)
        for s, e in zip(bounds, bounds[1:])
    ]
    h = np.concatenate(parts) if len(parts) > 1 else parts[0]
    return h, offsets


_SHINGLE_CHUNK_BYTES = 8 << 20


def _shingle_hash_flat(bufs: list, lens: np.ndarray, cnt: np.ndarray, k: int) -> np.ndarray:
    """Rolling hashes for one chunk of documents, concatenated once."""
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    total = len(data) - k + 1
    if total <= 0 or int(cnt.sum()) == 0:
        return np.zeros(0, dtype=np.uint64)
    mult = np.uint64(31) ** np.arange(k, dtype=np.uint64)
    h = np.zeros(total, dtype=np.uint64)
    tmp = np.empty(total, dtype=np.uint64)
    for j in range(k):
        tmp[:] = data[j : j + total]  # widening store into the u64 buffer
        tmp *= mult[j]
        h += tmp
    # Drop windows that cross a document boundary: doc i's invalid window
    # starts are its last min(k-1, len_i) byte positions — a tiny index
    # set ((k-1)·n_docs), no O(total) arange/gather needed.
    doc_starts = _cumsum0(lens)[:-1]
    bad_per_doc = lens - cnt
    bad = np.repeat(doc_starts + cnt, bad_per_doc) + _segment_local_index(bad_per_doc)
    keep = np.ones(total, dtype=bool)
    keep[bad[bad < total]] = False
    return h[keep]


def _segment_local_index(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = _cumsum0(counts)[:-1]
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _char_shingles(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Each doc → array of uint64 rolling hashes of its k-char shingles
    (views into the batched kernel's output; docs shorter than k hash to
    the single sentinel 0, preserving the original per-doc semantics)."""
    h, offsets = _shingle_hash_batch(texts, k)
    zero = np.zeros(1, dtype=np.uint64)
    return [
        h[offsets[i] : offsets[i + 1]] if offsets[i + 1] > offsets[i] else zero
        for i in range(len(offsets) - 1)
    ]


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
            h, offsets = _shingle_hash_batch(pdf[text_col], shingle_k)
            n_docs = len(pdf)
            cnt = np.diff(offsets)
            nonempty = cnt > 0
            ne_starts = offsets[:-1][nonempty]
            sig_mat = np.empty((n_hashes, n_docs), dtype=np.uint64)
            # One universal-hash pass + segment-min per hash function over
            # the WHOLE batch (np.minimum.reduceat) — no per-document loop.
            # Mersenne-prime reduction by fold (two shift-adds) instead of
            # u64 %, which numpy lowers to hardware division (~5× slower);
            # the fold is a deterministic congruent representative — all we
            # need for consistent minima.
            M = np.uint64(_MERSENNE)
            s61 = np.uint64(61)
            for i in range(n_hashes):
                g = a[i] * h + b[i]  # u64 wrap (our documented hash domain)
                g = (g & M) + (g >> s61)
                g = (g & M) + (g >> s61)
                if ne_starts.size:
                    sig_mat[i, nonempty] = np.minimum.reduceat(g, ne_starts)
                # docs shorter than k hash the single sentinel shingle 0
                z = b[i]
                z = (z & M) + (z >> s61)
                sig_mat[i, ~nonempty] = (z & M) + (z >> s61)
            sigs = sig_mat.T.astype(np.int64).tolist()
            yield pd.DataFrame({key_col: pdf[key_col], "signature": sigs})

    key_type = dict(df.dtypes)[key_col]
    sel = df.select(key_col, text_col)
    # The signature kernel is the heavy stage (n_hashes passes over every
    # shingle); a small input that arrives as one or two file-splits would
    # pin it to as many tasks. Fan out to the cluster's parallelism — a
    # no-op at real scale where the scan already has >= that many splits.
    default_par = df.sparkSession.sparkContext.defaultParallelism
    if sel.rdd.getNumPartitions() < default_par:
        sel = sel.repartition(default_par)
    return sel.mapInPandas(
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
    """64-bit SimHash per doc: sign-sum of shingle-hash bit vectors.

    Round 6: whole-batch kernel — one golden-ratio multiply over the flat
    shingle stream, chunked unpackbits + per-doc ``np.add.reduceat`` bit
    sums (guide §4.2) instead of ~5 tiny numpy calls per document, which
    dominated at many-small-docs scale. Values are identical: same rolling
    hashes, same multiply (u64 wrap), same vote/sign rule; docs shorter
    than k keep the single sentinel 0-shingle (votes = -1 -> simhash 0)."""

    def sh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        golden = np.uint64(0x9E3779B97F4A7C15)
        # (256, 8) little-endian bit table: votes for bits 8p..8p+7 fall out
        # of a per-(doc, byte-position) histogram times this LUT — counting
        # set bits per doc WITHOUT expanding every shingle to 64 bytes (the
        # unpackbits + add.reduceat formulation ran at ~40 MB/s; this one
        # measured 4.6x faster on the same batch, bit-identical words)
        lut = np.unpackbits(
            np.arange(256, dtype=np.uint8)[:, None], axis=1, bitorder="little"
        ).astype(np.int64)
        for pdf in batches:
            h, offsets = _shingle_hash_batch(pdf[text_col], shingle_k)
            n_docs = len(pdf)
            cnt = np.diff(offsets)
            if n_docs == 0:
                yield pd.DataFrame({key_col: pdf[key_col], "simhash": []})
                continue
            g = h * golden  # u64 wrap, same as the per-doc kernel
            g8 = g.view(np.uint8).reshape(-1, 8)
            doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), cnt)
            base = doc_rep << 8
            votes = np.empty((n_docs, 64), dtype=np.int64)
            for p in range(8):
                key = base + g8[:, p]
                hist = np.bincount(key, minlength=n_docs * 256).reshape(n_docs, 256)
                votes[:, p * 8 : (p + 1) * 8] = hist @ lut
            # docs shorter than k (cnt=0) reduce to the sentinel 0-shingle:
            # votes 0, len 1 -> all signs negative -> word 0; here votes*2 -
            # cnt = 0 -> sign False -> word 0, identical
            signs = (votes * 2 - cnt[:, None]) > 0
            packed = np.packbits(signs.astype(np.uint8), axis=1, bitorder="little")
            words = packed.view("<u8").reshape(-1).view(np.int64)
            yield pd.DataFrame({key_col: pdf[key_col], "simhash": words})

    kt = dict(df.dtypes)[key_col]
    sel = df.select(key_col, text_col)
    # Fan out to cluster parallelism: a small input arriving as one or two
    # file-splits would pin the kernel to as many tasks (a no-op at real
    # scale where the scan already has >= this many splits) — same guard
    # minhash_signatures uses.
    default_par = df.sparkSession.sparkContext.defaultParallelism
    if sel.rdd.getNumPartitions() < default_par:
        sel = sel.repartition(default_par)
    return sel.mapInPandas(sh, schema=f"{key_col} {kt}, simhash long")


def _near_dup_pair_kernel(threshold: float):
    """Per-bucket candidate-pair kernel for :func:`embedding_near_dups`.

    Emits, for every in-bucket pair that could possibly pass the cosine
    threshold, the EXACT left-associated dot product and norm product —
    the same IEEE-double operation sequence as the Catalyst
    ``aggregate(zip_with(...))`` fold it replaces (acc = 0.0; acc += x_j*y_j
    in index order; norms = sqrt of the same fold over squares). Division,
    the nullif zero-denominator guard, HALF_UP rounding and the threshold
    filter all stay Spark expressions downstream, so the surviving rows are
    bit-identical to the old join form.

    Candidate screening uses one BLAS gemm per bucket (pairwise-summed, NOT
    bit-identical) with a 1e-4 margin below the threshold: the absolute
    cosine difference between pairwise and sequential summation is bounded
    by ~dim·eps (≤1e-13 for any realistic dim, since Σ|x_i·y_i| ≤
    ‖x‖·‖y‖), and the rounding boundary needs only 5e-7 — so no pair the
    exact expression would keep can be screened out. NaN/inf dots are
    always kept as candidates (Spark orders NaN above every number, so the
    old form emitted them; only a provably-null cosine — zero denominator —
    or a provably-below-threshold finite one may be dropped early).
    """
    margin = 1e-4

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        keys_out, dots_out, denoms_out = [], [], []
        order = pdf.iloc[:, 0].argsort(kind="stable").to_numpy()
        keys = pdf.iloc[:, 0].to_numpy()[order]
        vecs = pdf.iloc[:, 1].to_numpy()[order]
        lens = np.fromiter((len(v) for v in vecs), np.int64, len(vecs))
        # zip_with pads unequal lengths with null -> null dot -> dropped
        # by the filter: only equal-length rows can ever pair.
        for ln in np.unique(lens):
            sel = np.flatnonzero(lens == ln)
            n = len(sel)
            if n < 2 or ln == 0:
                continue  # len-0 vecs: dot 0, norm 0 -> null cosine
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[sel]])
            gkeys = keys[sel]
            # exact sequential norms (same fold order as the expression)
            acc = np.zeros(n)
            for j in range(int(ln)):
                acc += V[:, j] * V[:, j]
            norms = np.sqrt(acc)
            slab = max(1, (8 << 20) // max(n, 1))  # ≤ ~64 MB of G per slab
            cand_i: list[np.ndarray] = []
            cand_j: list[np.ndarray] = []
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                for i0 in range(0, n - 1, slab):
                    i1 = min(i0 + slab, n)
                    G = V[i0:i1] @ V.T  # approx dots, BLAS
                    denom = norms[i0:i1, None] * norms[None, :]
                    approx = G / denom
                    keep = (denom != 0) & (
                        ~np.isfinite(approx) | (approx >= threshold - margin)
                    )
                    # strict upper triangle: position j > position i, and
                    # equal keys never pair (strict key_a < key_b)
                    rows = np.arange(i0, i1)[:, None]
                    cols = np.arange(n)[None, :]
                    keep &= (cols > rows) & (gkeys[None, :] != gkeys[:, None][i0:i1])
                    ii, jj = np.nonzero(keep)
                    if ii.size:
                        cand_i.append(ii + i0)
                        cand_j.append(jj)
            if not cand_i:
                continue
            ci = np.concatenate(cand_i)
            cj = np.concatenate(cand_j)
            # exact left-associated dot for the (few) candidates
            X, Y = V[ci], V[cj]
            dot = np.zeros(len(ci))
            for j in range(int(ln)):
                dot += X[:, j] * Y[:, j]
            keys_out.append((gkeys[ci], gkeys[cj]))
            dots_out.append(dot)
            denoms_out.append(norms[ci] * norms[cj])
        if not keys_out:
            return pd.DataFrame(
                {"key_a": pdf.iloc[:0, 0], "key_b": pdf.iloc[:0, 0],
                 "_dot": pd.Series([], dtype="float64"),
                 "_denom": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {
                "key_a": np.concatenate([a for a, _ in keys_out]),
                "key_b": np.concatenate([b for _, b in keys_out]),
                "_dot": np.concatenate(dots_out),
                "_denom": np.concatenate(denoms_out),
            }
        )

    return kernel


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
    n/2^planes) through a per-bucket vectorized kernel — co-partitioned
    shuffle, never all-pairs, the 100-TB-safe shape. Bucketing is pure
    Catalyst; the quadratic in-bucket pair scoring runs as one BLAS matmul
    per bucket inside ``applyInPandas`` (optimization guide §4.2: hand
    whole batches to native kernels) instead of the old per-pair
    interpreted ``aggregate(zip_with(...))`` expressions, which evaluated
    ~pairs×dim lambda nodes with no codegen. The kernel only *screens*
    candidates; the exact dot/denominator it emits use the identical
    left-associated double fold, and division, the nullif zero-vector
    guard, rounding and the threshold filter remain Spark expressions — so
    results are bit-identical to the expression form (and the DuckDB
    oracle twin).
    """
    from .similarity import lsh_index

    bucketed = lsh_index(df, vec_col, key_col, n_planes, seed, dim)
    # Rows with a null key never satisfy strict key_a < key_b; a null vec
    # or any null element nulls the dot (null * y -> null, acc + null ->
    # null) so every pair involving the row is dropped by the filter.
    # Removing them up front keeps the kernel all-NaN-is-genuine (pandas
    # would blur null into NaN, and NaN *passes* Spark's >= filter while
    # null fails it).
    clean = bucketed.filter(
        F.col(key_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    )
    kt = dict(df.dtypes)[key_col]
    pairs = clean.select(key_col, vec_col, "bucket").groupBy("bucket").applyInPandas(
        _near_dup_pair_kernel(threshold),
        schema=f"key_a {kt}, key_b {kt}, _dot double, _denom double",
    )
    cos = F.round(F.col("_dot") / F.nullif(F.col("_denom"), F.lit(0.0)), 6)
    return (
        pairs.select("key_a", "key_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def dedup_components(
    keys: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    a_col: str = "key_a",
    b_col: str = "key_b",
    max_iters: int = 25,
) -> DataFrame:
    """Duplicate-CLUSTER assignment: connected components over a verified
    near-duplicate pair graph, labels = min key per component (singletons
    keep their own key). The canonical last stage of a dedup pipeline —
    pairs say "these two match", components say "keep one per cluster".

    Distributed min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels (one join + one groupBy per
    round); convergence in at most graph-diameter rounds. Near-dup cluster
    graphs are small-diameter in practice (dups of one document all share
    it as a neighbor); for adversarially long chains the round count is
    bounded by ``max_iters`` and convergence is asserted. Per-round state
    is one (node, label) DataFrame — no driver-side graph, shuffles keyed
    by node id only (the alternating small-star/large-star variant would
    cut worst-case rounds to O(log n); the simple propagation keeps every
    round a plain AQE-optimized join at a per-round cost this size-class
    never notices).

    Lineage control: every round ``localCheckpoint``s its label table.
    Iterative self-joins are the one Spark shape where ``persist`` is NOT
    enough — caching stores data but keeps the logical plan, which then
    nests one level per round and sends Catalyst/AQE re-optimization
    superlinear (measured: a 6-node toy graph spun the driver JVM for
    minutes). Checkpointing flattens each round's plan to a scan of the
    materialized RDD, making per-round planning O(1). On a real cluster,
    swap ``localCheckpoint`` for a reliable ``checkpoint`` dir if executor
    loss during the (short) propagation must be survivable.
    """
    nodes = keys.select(F.col(key_col).alias("node")).distinct()
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .union(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select("node", F.col("node").alias("lbl")).localCheckpoint()
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges.s == labels.node)
            .groupBy("d")
            .agg(F.min("lbl").alias("nl"))
        )
        new_labels = (
            labels.join(neigh, labels.node == neigh.d, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nl", "lbl")).alias("new_lbl"),
                F.col("lbl").alias("old_lbl"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("new_lbl") < F.col("old_lbl")).count()
        labels = new_labels.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_components did not converge in {max_iters} rounds"
        )
    return labels.select(F.col("node").alias(key_col), F.col("lbl").alias("group_id"))

"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Schema: (repo:string, path:string, commit:string, lang:string,
content:string). Every field is a pure function of the row id, so the table
is identical regardless of partitioning, batch boundaries, or retries — the
property the manifest checkpoint protocol depends on (SURVEY.md §7 hard-part
(d)). Skew is built in per FIXTURES.md §F1: one giant repo holds ~40% of
rows, exercising the salting path. Edge rows (empty content, 1 byte, 64 KiB
boundary, multi-MB outlier, UTF-8/NUL/CRLF) sit at fixed ids.

Generation runs distributed: spark.range(n) → mapInPandas, all numpy/pandas
vectorized per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "zig", "rust", "go", "java", "c", "markdown", "json"]
EXT = {
    "python": "py",
    "zig": "zig",
    "rust": "rs",
    "go": "go",
    "java": "java",
    "c": "c",
    "markdown": "md",
    "json": "json",
}

# Per-language snippet templates — keyword/identifier vocabulary with
# indentation runs (dict/FSST codec targets).
_SNIPPETS = {
    "python": "def process_{k}(values, config):\n    result = []\n    for value in values:\n        if value is not None:\n            result.append(value * config.scale_{k})\n    return result\n\n",
    "zig": "pub fn decode_{k}(allocator: Allocator, reader: *Reader) ![]u8 {{\n    const len = try reader.readInt(u32, .little);\n    const buf = try allocator.alloc(u8, len);\n    return buf;\n}}\n\n",
    "rust": "pub fn encode_{k}(values: &[i64]) -> Vec<u8> {{\n    let mut out = Vec::with_capacity(values.len());\n    for v in values {{\n        out.extend_from_slice(&v.to_le_bytes());\n    }}\n    out\n}}\n\n",
    "go": "func Process{k}(values []int64) []int64 {{\n\tout := make([]int64, 0, len(values))\n\tfor _, v := range values {{\n\t\tout = append(out, v*{k})\n\t}}\n\treturn out\n}}\n\n",
    "java": "public static List<Long> transform{k}(List<Long> values) {{\n    List<Long> result = new ArrayList<>();\n    for (Long value : values) {{\n        result.add(value + {k}L);\n    }}\n    return result;\n}}\n\n",
    "c": "static int decode_block_{k}(const uint8_t *buf, size_t len, int64_t *out) {{\n    for (size_t i = 0; i < len / 8; i++) {{\n        out[i] = (int64_t)read_le64(buf + i * 8);\n    }}\n    return 0;\n}}\n\n",
    "markdown": "## Section {k}\n\nThis module implements the encoder for block {k}.\n\n- input: int64 column\n- output: packed bytes\n\n```\nexample {k}\n```\n\n",
    "json": '{{"name": "module_{k}", "version": "1.{k}.0", "dependencies": {{"codec": "^2.{k}"}}, "keywords": ["encode", "decode", "block{k}"]}}\n',
}

_PRIME = 0x9E3779B97F4A7C15
_MASK = (1 << 64) - 1


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style deterministic per-id hash (vectorized, uint64)."""
    x = (ids.astype(np.uint64) + np.uint64((salt * _PRIME) & _MASK)) * np.uint64(_PRIME)
    x &= np.uint64(_MASK)
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    return x


def _gen_batch(ids: np.ndarray, giant_frac: float) -> pd.DataFrame:
    n = len(ids)
    h0 = _mix(ids, 0)
    h1 = _mix(ids, 1)
    h2 = _mix(ids, 2)
    # Skew: ~giant_frac of rows land in one mega repo.
    is_giant = (h0 % np.uint64(1000)) < np.uint64(int(giant_frac * 1000))
    org = (h0 % np.uint64(17)).astype(np.int64)
    rep = (h1 % np.uint64(41)).astype(np.int64)
    repo = np.where(is_giant, "org0/megarepo", None)
    repo = pd.Series(repo, dtype="object")
    small = ~is_giant
    repo[small] = [f"org{o}/repo{r}" for o, r in zip(org[small], rep[small])]

    lang_idx = (h1 % np.uint64(len(LANGS))).astype(np.int64)
    langs = np.array(LANGS, dtype=object)[lang_idx]
    d1 = (h2 % np.uint64(12)).astype(np.int64)
    d2 = ((h2 >> np.uint64(8)) % np.uint64(30)).astype(np.int64)
    fnum = ((h2 >> np.uint64(16)) % np.uint64(500)).astype(np.int64)
    paths = [
        f"src/mod{a}/sub{b}/file_{c}.{EXT[lg]}" for a, b, c, lg in zip(d1, d2, fnum, langs)
    ]
    commits = [
        f"{int(a):016x}{int(b):016x}{(int(a) ^ int(b)) & 0xFF:02x}{(int(a) >> 40) & 0xFFFFFF:06x}"
        for a, b in zip(h0, h1)
    ]

    # Content size: log-normal-ish via hash bits, 50 B – ~20 KiB typical.
    size_sel = (h2 % np.uint64(10000)).astype(np.float64) / 10000.0
    target = (50.0 * np.exp(size_sel * 6.0)).astype(np.int64)  # 50 B .. ~20 KB
    contents = []
    for i in range(n):
        rid = int(ids[i])
        lg = langs[i]
        # Fixed edge rows.
        if rid == 0:
            contents.append("")
            continue
        if rid == 1:
            contents.append("x")
            continue
        if rid == 2:
            snippet = _SNIPPETS[lg].format(k=7)
            reps = (65536 // len(snippet.encode())) + 1
            contents.append((snippet * reps)[:65536])  # exact 64 KiB boundary
            continue
        if rid == 3:
            snippet = _SNIPPETS[lg].format(k=9)
            contents.append(snippet * (3_000_000 // len(snippet) + 1))  # multi-MB outlier
            continue
        if rid == 4:
            contents.append("emoji 🚀 CJK 你好 cyrillic Здравствуй NUL\x00CRLF\r\nend")
            continue
        k = int(h0[i] % np.uint64(50))
        snippet = _SNIPPETS[lg].format(k=k)
        reps = max(1, int(target[i]) // len(snippet))
        # Unique trailer so near-dup ≠ exact-dup everywhere.
        contents.append(snippet * reps + f"# trailer {int(h1[i]):016x}\n")
    return pd.DataFrame(
        {
            "repo": repo,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def source_code_table(
    spark: SparkSession,
    n_rows: int = 10_000,
    giant_frac: float = 0.4,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus; identical for any partitioning."""
    base = spark.range(0, n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), giant_frac)

    return base.mapInPandas(gen, schema="repo string, path string, commit string, lang string, content string")

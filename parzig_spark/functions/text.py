"""Text analysis for training-data pipelines: stats, quality, language-ID,
fingerprinting, token counting.

Everything SQL-expressible stays in built-in pyspark.sql.functions (JVM
whole-stage codegen, oracle-checkable in DuckDB); only the n-gram language
model runs as an Arrow-vectorized pandas UDF.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they i".split()
)


def text_stats(df: DataFrame, text_col: str = "text", key_cols: list[str] | None = None) -> DataFrame:
    """Per-document counting stats — all JVM-side, all DuckDB-oracleable."""
    key_cols = key_cols or [df.columns[0]]
    t = F.col(text_col)
    return df.select(
        *key_cols,
        F.length(t).alias("n_chars"),
        F.octet_length(t).alias("n_bytes"),
        (F.length(t) - F.length(F.replace(t, F.lit("\n"), F.lit(""))) + F.lit(1)).alias("n_lines"),
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .alias("n_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", key_cols: list[str] | None = None) -> DataFrame:
    """Quality facets as exact integer counts (length / punctuation /
    stopword / alphabetic) so the oracle comparison is float-free."""
    key_cols = key_cols or [df.columns[0]]
    t = F.col(text_col)
    lower = F.lower(t)
    alpha_only = F.regexp_replace(t, "[^A-Za-z]", "")
    punct_only = F.regexp_replace(t, "[^.,;:!?]", "")
    tokens = F.split(lower, "[^a-z]+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return df.select(
        *key_cols,
        F.length(t).alias("n_chars"),
        F.length(alpha_only).alias("n_alpha"),
        F.length(punct_only).alias("n_punct"),
        F.size(F.filter(tokens, lambda x: F.array_contains(stop_arr, x))).alias("n_stopwords"),
    )


# BPE-ish pre-tokenizer classes (GPT-2 style without lookaheads, so Java
# regex and RE2 tokenize identically): letter runs, single digits, symbol
# runs. The classes are disjoint → unambiguous leftmost match in both
# engines.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def token_counts(df: DataFrame, text_col: str = "text", key_cols: list[str] | None = None) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document, both counted
    JVM-side (regexp_count) — a cheap corpus-sizing pass for training-data
    budgeting, DuckDB-oracleable."""
    key_cols = key_cols or [df.columns[0]]
    t = F.col(text_col)
    ws = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    return df.select(
        *key_cols,
        ws.alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_PATTERN)).alias("n_bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", key_cols: list[str] | None = None) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    md5 is identical across Spark and DuckDB, so dedup built on it is
    oracle-checkable end to end.
    """
    key_cols = key_cols or [df.columns[0]]
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(*key_cols, F.md5(normalized).alias("fp"))


# ---------------------------------------------------------------------------
# Language ID: tiny character-trigram profiles per language, scored with a
# vectorized bag-of-trigrams match. Heuristic (no external models); runs as
# mapInPandas over Arrow batches.
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    "python": ["def ", "self", "impo", "rt ", "for ", ":\n  ", "return", "none"],
    "zig": ["pub f", "fn ", "try ", "!voi", "alloc", "const", "var ", "u8"],
    "rust": ["fn ", "let ", "mut ", "&[", "vec<", "impl ", "pub f", "::"],
    "go": ["func ", ":= ", "range", "err ", "nil", "chan ", "go ", "\tfor"],
    "java": ["public ", "void ", "new ", "class ", "list<", "string", "static"],
    "c": ["#incl", "int ", "char ", "void ", "size_t", "->", "uint8"],
    "markdown": ["## ", "\n- ", "```", "](", "# ", "\n\n", "*"],
    "json": ['{"', '":', '",', "]}", "null", "true", "false"],
}


def lang_id(df: DataFrame, text_col: str = "text", key_cols: list[str] | None = None) -> DataFrame:
    key_cols = key_cols or [df.columns[0]]
    cols = list(key_cols) + [text_col]
    profiles = {lang: [p.lower() for p in pats] for lang, pats in _LANG_PROFILES.items()}

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.lower()
            best_lang = np.full(len(pdf), "unknown", dtype=object)
            best_score = np.zeros(len(pdf))
            for lang, pats in profiles.items():
                s = np.zeros(len(pdf))
                for p in pats:
                    s += texts.str.count(re.escape(p)).to_numpy(dtype=float)
                # normalize by doc length so long docs don't always win
                s = s / np.maximum(texts.str.len().to_numpy(dtype=float), 1.0)
                better = s > best_score
                best_lang[better] = lang
                best_score[better] = s[better]
            out = pdf[key_cols].copy()
            out["lang_pred"] = best_lang
            out["lang_score"] = best_score
            yield out

    key_schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in key_cols)
    return df.select(*cols).mapInPandas(
        score, schema=f"{key_schema}, lang_pred string, lang_score double"
    )


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Corpus vocabulary: top-k lowercased alphabetic tokens by frequency
    (vocabulary-building stage of a tokenizer pipeline). Explode + hash
    aggregate — map-side partial combine keeps the shuffle at distinct-token
    granularity; the final top-k is a k-row TakeOrderedAndProject. Ties
    break on the token for a deterministic tail."""
    toks = df.select(
        F.explode(F.expr(f"regexp_extract_all({text_col}, '[A-Za-z]+', 0)")).alias("tok")
    )
    return (
        toks.select(F.lower(F.col("tok")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(k)
    )


def hash_sample(df: DataFrame, key_col: str, hex_digits: str = "0123") -> DataFrame:
    """Deterministic held-out sampling: keep rows whose md5(key) starts with
    one of ``hex_digits`` (len/16 of the corpus, ~uniform per stratum, so
    per-language proportions are preserved without a per-stratum pass).
    Pure map-side filter — no shuffle, no RNG state, identical on any
    cluster size or engine (md5 of the decimal key string is portable to
    every SQL dialect), which is what makes train/held-out splits
    reproducible across reruns and engines."""
    first = F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)
    return df.filter(first.isin(*list(hex_digits)))

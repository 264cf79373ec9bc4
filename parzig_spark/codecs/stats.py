"""Column min/max statistics in a canonical string domain.

Shared by the partition-level manifest stats (operators/encode.py) and the
sub-partition page stats (the ``paged`` layout in codecs/__init__.py) — the
engine's analog of the Parquet ``Statistics`` / ``ColumnIndex`` structures
the reference parses but never consults
(/root/reference/src/generated/parquet.zig:55-76,506-515).
"""

from __future__ import annotations

import pyarrow as pa

STR_STAT_CHARS = 16


def string_upper_bound(s: str, limit: int = STR_STAT_CHARS) -> str | None:
    """Truncated-but-SOUND upper bound for a string max — the Parquet
    Statistics trick (the reference parses exactly these Statistics,
    /root/reference/src/generated/parquet.zig:55-76): truncate to ``limit``
    code points, then increment the last incrementable one so the result is
    strictly greater than every string sharing the truncated prefix.
    Returns ``s`` itself when it already fits; None when no bound exists
    (all-U+10FFFF prefix). Comparison domain is code points — identical to
    UTF-8 byte order, which both Spark's UTF8String and Python use."""
    if len(s) <= limit:
        return s
    t = s[:limit]
    for i in range(len(t) - 1, -1, -1):
        cp = ord(t[i])
        if cp < 0x10FFFF:
            nxt = cp + 1
            if 0xD800 <= nxt <= 0xDFFF:  # skip the unencodable surrogate gap
                nxt = 0xE000
            return t[:i] + chr(nxt)
    return None


def column_minmax(arr: pa.Array) -> tuple[str | None, str | None]:
    """Canonical-string min/max for orderable scalar types (pruning stats).

    Numerics parse back as double; date/timestamp ISO strings order
    lexicographically. Strings record a truncated 16-code-point lower bound
    (a prefix is ≤ the full value) and a truncated-then-incremented upper
    bound (:func:`string_upper_bound`) — both sound, never exact beyond 16
    chars, so manifests stay small while equality/range predicates on e.g.
    ``lang`` or ``repo`` prune partitions. Binary/nested are skipped."""
    t = arr.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)) and len(arr) != arr.null_count:
        mm = pa.compute.min_max(arr)
        smin, smax = mm["min"].as_py(), mm["max"].as_py()
        return smin[:STR_STAT_CHARS], string_upper_bound(smax)
    orderable = (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_date(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_time(t)
        or pa.types.is_decimal(t)
    )
    if not orderable or len(arr) == arr.null_count:
        return None, None
    if t == pa.float16():  # no Arrow min_max kernel for halffloat
        vals = arr.drop_null().to_numpy(zero_copy_only=False)
        return str(float(vals.min())), str(float(vals.max()))
    mm = pa.compute.min_max(arr)
    return str(mm["min"].as_py()), str(mm["max"].as_py())

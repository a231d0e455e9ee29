"""Bloom-filter sketch as pure DataFrame column algebra.

PySpark's ``DataFrameStatFunctions`` does not expose the JVM
``bloomFilter`` builder (Scala-only), so this module implements the
sketch with public column functions end-to-end:

- **build** is a distributed bit-OR aggregate: each row maps to its k
  bit positions (Kirsch–Mitzenmacher double hashing over two
  ``xxhash64`` streams), positions fold into 64-bit words with
  ``bit_or`` — the same associative merge a 1000-executor partial
  aggregation performs, so the build is one map-side-combined shuffle
  of at most ``m/64`` rows regardless of input size.
- **probe** is a JVM-side boolean column over the broadcast word
  array (a literal of ``m/64`` longs): no shuffle, no Python, usable
  inside any filter — the crawl-frontier "skip already-fetched urls"
  fast path without a join against history.

All arithmetic is pre-modded so it stays in-range under ANSI mode.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m bits / k hashes for an expected ``n_items``
    at false-positive rate ``fpp`` (rounded up to a whole word)."""
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def bloom_positions(c: Column, m: int, k: int) -> Column:
    """Array of k bit positions in [0, m): ``(h1 + i*h2) mod m`` with
    h1, h2 independent xxhash64 streams. Each hash is modded before
    the combine so the sum never exceeds ``2m`` (ANSI-overflow-safe).
    """
    h1 = F.pmod(F.xxhash64(c), F.lit(m))
    h2 = F.pmod(F.xxhash64(c, F.lit(0x9E3779B9)), F.lit(m))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]
    )


def bloom_positions_md5(c: Column, m: int, k: int) -> Column:
    """Engine-portable position family: the same Kirsch–Mitzenmacher
    combine over two md5-prefix streams (the registry's cross-engine
    hash primitive) instead of xxhash64, so a DuckDB oracle can replay
    the exact bitmap bit-for-bit. Production keeps ``bloom_positions``
    (xxhash64 is far cheaper than md5); this variant exists for
    oracle-checked query plans."""
    from .text import md5_int

    h1 = F.pmod(md5_int(c), F.lit(m))
    h2 = F.pmod(md5_int(F.concat(c, F.lit("#2"))), F.lit(m))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]
    )


# 1<<b for b in 0..63 as signed longs (1<<63 wraps to Long.MIN_VALUE);
# a literal lookup array because pyspark's shiftleft() wrapper only
# takes a Python-int shift amount, not a column.
_POW2 = F.array(
    *[
        F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
        for b in range(64)
    ]
)


def _bit_mask(p: Column) -> Column:
    return F.element_at(_POW2, (p % 64).cast("int") + 1)


def bloom_build(
    df: DataFrame, col: str, m: int, k: int, positions=bloom_positions
) -> list[int]:
    """Build the filter distributed; return the word bitmap (length
    ``m/64``, signed-long words). The only collected rows are the
    non-empty words — bounded by ``m/64``, never by ``len(df)``."""
    words = (
        df.select(F.explode(positions(F.col(col), m, k)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            _bit_mask(F.col("p")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m // 64)
    for r in words:
        bitmap[int(r.w)] = int(r.bits)
    return bitmap


def bloom_words_df(
    df: DataFrame, col: str, m: int, k: int, positions=bloom_positions
) -> DataFrame:
    """Collect-free build: the (w, bits) word rows as a DataFrame (at
    most m/64 rows), for composing the filter INSIDE a single query
    plan — fold to a one-row broadcast map and probe with
    ``F.try_element_at`` instead of driver-collecting the bitmap."""
    return (
        df.select(F.explode(positions(F.col(col), m, k)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            _bit_mask(F.col("p")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_might_contain(
    c: Column, bitmap: list[int], m: int, k: int, positions=bloom_positions
) -> Column:
    """Boolean membership column against a built bitmap, fully
    JVM-side: the bitmap ships as a literal array (m/64 longs — a few
    KB even for million-item filters), each of the k probe bits is an
    ``element_at`` + bitwise AND. No false negatives by construction."""
    words = F.array(*[F.lit(w).cast("long") for w in bitmap])
    return F.forall(
        positions(c, m, k),
        lambda p: (
            F.element_at(words, (p / 64).cast("int") + 1).bitwiseAND(
                _bit_mask(p)
            )
            != 0
        ),
    )

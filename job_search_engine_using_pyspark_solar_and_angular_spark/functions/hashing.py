"""Deterministic, oracle-reproducible hash functions.

MinHash/SimHash/fingerprinting need a token hash that (a) is stable across
runs and partitions, (b) can be reproduced exactly in ANSI SQL so the DuckDB
oracle can differential-test the operators. Spark's builtin ``hash``/``xxhash64``
are murmur/xxhash with Spark-private seeds, which DuckDB cannot reproduce — so
the engine standardizes on **md5-prefix hashes**: take the first 15 hex chars
of md5 (60 bits, always positive in an int64) via ``conv``. md5 exists in both
engines with identical output, making every sketch operator exactly
differential-testable.

At 100 TB this stays JVM-side (md5 + conv are codegen'd expressions); the cost
is one digest per token, the same order of work Solr spends tokenizing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^60 fits comfortably in int64; 15 hex chars = 60 bits.
MD5_PREFIX_LEN = 15
# Mersenne prime 2^61-1: modulus for the universal-hash family used by MinHash.
MERSENNE_61 = (1 << 61) - 1


def md5_long(col: Column | str) -> Column:
    """First 15 hex chars of md5 as a non-negative int64.

    DuckDB equivalent (exact):
        CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)  -- via from_hex
        i.e.  from_hex is not needed: use  CAST(strtol(substr(md5(x),1,15), 16) ...)
        The oracle SQL in queries/oracles.py uses
        ``from_hex``-free form: ``('x' prefix parse)`` — see _MD5LONG template.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, MD5_PREFIX_LEN), 16, 10).cast("long")


def minhash_value(token_hash: Column, a: int, b: int) -> Column:
    """One universal-hash permutation h(x) = (a*x + b) mod (2^61-1).

    a/b are small deterministic constants (< 2^20) so a*x fits in... it does
    NOT fit in int64 for x < 2^60 — therefore we first fold x into 2^31 space
    (x mod 2147483647) making a*x' < 2^51: exact in int64 and exact in DuckDB.
    """
    folded = token_hash % F.lit(2147483647)
    return (F.lit(a) * folded + F.lit(b)) % F.lit(MERSENNE_61)


def char_shingles(col: Column | str, k: int = 8) -> Column:
    """Character k-gram shingles of a string as array<string>.

    Built with sequence+transform (no UDF): positions 1..len-k+1, substring k.

    PERF WARNING: UTF-8 ``substring`` is O(position) (byte scan to char i),
    so this column is O(n²) in string length — fine for short strings, wrong
    for whole documents. Document-scale shingling uses the exploded-chars +
    ``lead`` window formulation in ``textstats.winnowing_fingerprints``
    (any loop-invariant array bound here gets re-inlined into the per-element
    lambda by projection collapse, so there is no O(n) array variant of this
    column function).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - F.lit(k - 1)
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, F.lit(k)))
    )


def token_ngrams(tokens: Column, n: int = 3) -> Column:
    """Token n-grams (shingles) from an array<string>: join every window of n
    consecutive tokens with a space. Pure higher-order functions."""
    cnt = F.size(tokens) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.greatest(cnt, F.lit(0)))
    return F.when(cnt <= 0, F.array()).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        )
    )

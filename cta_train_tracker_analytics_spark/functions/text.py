"""Text-analysis primitives for the LLM-data-pipeline operators (north
star; SURVEY.md §2.11): tokenization, portable 64-bit-safe hashing, minhash
permutations, fingerprints. All native column expressions — no Python UDFs.

Hashing is md5-based (``conv(substr(md5(x),1,15),16,10)``) rather than
xxhash64 so the DuckDB oracle can reproduce every value bit-for-bit
(``('0x'||substr(md5(x),1,15))::BIGINT``): 60 bits, always positive, fits a
BIGINT in both engines. Permutation parameters come from an explicit LCG so
both engines derive identical constants with pure integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — small enough that a*h never overflows a BIGINT.
MINHASH_PRIME = 2147483647

#: number of minhash permutations / LSH band layout (16 = 4 bands × 4 rows).
MINHASH_K = 16
MINHASH_BANDS = 4


def lcg(i: int, m: int) -> int:
    """Deterministic pseudo-random parameter stream (glibc LCG constants) —
    replicated literally in oracle SQL."""
    return (1103515245 * i + 12345) % m


def minhash_params() -> list[tuple[int, int]]:
    """(a_i, b_i) for each of the K permutations; a_i != 0."""
    return [
        (lcg(i, MINHASH_PRIME - 1) + 1, lcg(i + 100, MINHASH_PRIME))
        for i in range(MINHASH_K)
    ]


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lower-cased text — array<string>."""
    return F.split(F.lower(F.trim(col)), r"\s+")


# --- SQL-fragment twins (r19 optimization round 2) -----------------------
#
# Same single-parse recipe as similarity.dot_sql (r18): each Column
# operator costs ~13-37 py4j round-trips on this PySpark, so the shared
# dedup/text builders were spending ~300-900 round-trips of
# single-threaded driver time per plan BUILD, re-paid per run. One
# F.expr/selectExpr string parses the identical tree in ~3 round-trips.
# Equivalence pinned by tests/test_round19_ops.py::test_dedup_fragment
# _twins_exact (sameSemantics vs inline replicas of the Column forms).

def tokens_sql(frag: str) -> str:
    """SQL-fragment twin of ``tokens`` — ``frag`` is a SQL expression
    (column names pre-quoted via similarity.q_ident when
    caller-supplied). ``'\\\\s+'`` in the rendered SQL lexes to the same
    ``\\s+`` pattern string F.split ships."""
    return f"split(lower(trim({frag})), '\\\\s+')"


def hash60_sql(frag: str) -> str:
    """SQL-fragment twin of ``hash60``."""
    return f"cast(conv(substring(md5({frag}), 1, 15), 16, 10) as bigint)"


def token_count(col: Column) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single symbols each
    count as one token — the standard cheap proxy for subword tokenizers."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast("bigint")


def hash60(col: Column) -> Column:
    """Portable 60-bit hash of a string: first 15 hex chars of md5 as a
    BIGINT. Identical in DuckDB via ('0x'||substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the whitespace-normalized, lower-cased
    text — stable under reflow/case changes (rolling-hash-class dedup key)."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def _class_count(col: Column, chars: str) -> Column:
    """Count of characters from ``chars`` via length-minus-translate —
    a plain table lookup per char, ~1.5× faster than a regexp_count scan
    for single-character classes, with identical counts."""
    return (F.length(col) - F.length(F.translate(col, chars, ""))).cast("bigint")


def quality_features(col: Column) -> dict[str, Column]:
    """Heuristic quality signals: length, tokens, alpha/digit/punct ratios.
    All integer counts + one exact division — oracle-reproducible."""
    n_chars = F.length(col).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": token_count(col),
        "n_alpha": _class_count(
            col, "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        ),
        "n_digits": _class_count(col, "0123456789"),
        "n_punct": _class_count(col, ".,;:!?"),
    }

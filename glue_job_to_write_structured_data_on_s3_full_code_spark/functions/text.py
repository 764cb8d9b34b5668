"""Text-analysis column builders (north-star extensions, SURVEY.md §7 M5).

All builders are pure ``pyspark.sql.functions`` compositions — JVM-side,
whole-stage-codegen'd, no Python in the hot path — and each has an exact
ANSI-SQL equivalent so the DuckDB oracle can replay it.

Cross-engine hashing: Spark's ``xxhash64`` has no DuckDB twin, so where a
query needs hash values the oracle can reproduce we use the top 60 bits of
``md5`` (``conv(hex, 16, 10)`` ↔ DuckDB ``('0x' || hex)::UBIGINT``) — 60
bits so the value fits a signed BIGINT in both engines. MinHash-LSH
derives its whole seeded family from ONE md5 per shingle via a
Carter-Wegman universal hash (see ``operators.dedup.minhash_coeffs``), so
it is oracle-checkable too without paying md5 once per seed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string → empty array (both engines
    agree only if the empty case is handled explicitly).

    Edge-trimming is regexp-based because ``F.trim`` strips ONLY ASCII
    spaces: raw text ending in a newline (almost all real text) would
    otherwise split into a spurious trailing '' token, silently
    over-counting tokens in every downstream packing/budget computation.
    Raw-text DuckDB oracles mirror this with the same regexp."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish regex tokenizer: word pieces + isolated non-space symbols.
    Character classes kept to ASCII sets so Java-regex and RE2 agree."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0)


def normalized_text(col: Column | str) -> Column:
    """Lowercase, collapse non-alphanumerics to single spaces, trim — the
    canonical form used for fingerprinting and shingling."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))


def token_sort_key(col: Column | str) -> Column:
    """Word-order-insensitive exact-match key: normalized tokens, sorted,
    rejoined ("widget red" and "red widget" collide). The equality tier
    of fuzzy name matching — a plain groupBy/join key, no similarity
    scoring needed."""
    return F.concat_ws(" ", F.array_sort(tokens(normalized_text(col))))


def consonant_skeleton(col: Column | str) -> Column:
    """Phonetic-ish blocking key: lowercase, strip vowels and everything
    non-alphabetic ("widget" → "wdgt"). Collides spelling variants that
    differ in vowels — a cheap deterministic stand-in for soundex that
    both engines spell identically (regexp_replace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "[aeiou]|[^a-z]", "")


def md5_hash60(col: Column) -> Column:
    """Unsigned 60-bit hash reproducible in DuckDB:
    ``('0x' || substr(md5(x), 1, 15))::UBIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

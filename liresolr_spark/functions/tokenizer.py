"""Code-aware tokenizer + liresolr-style hash-token emission.

The reference indexes each feature twice: a whitespace-tokenized hash-token
text field (``_ha``) feeding the inverted index, and a binary payload
(``_hi``) for exact re-rank (ref: ParallelSolrIndexer.java:459-472,
README.md:144-160). Hash tokens there are lowercase-hex 32-bit ints,
space-joined (ref: ParallelSolrIndexer.java:197-206 `Integer.toHexString`),
analyzed by pure whitespace tokenization with no stemming/stop words
(ref: SimilarRequestHandler.java:100 WhitespaceAnalyzer).

Our corpus is source code, so the lexical tokenizer is code-aware
(camelCase / snake_case splitting, lowercased) and the hash-token emitter
maps each lexical token to a 32-bit bucket rendered as lowercase hex —
the exact shape of the reference's `_ha` tokens.

THE TOKENIZER IS THE INDEX/QUERY CONTRACT: index build and query must use
the same version (ref: LireRequestHandler.java:409 "hash functions must
match" invariant). Three implementations share one spec and are
cross-tested:

1. ``tokenize_expr``       — Spark built-ins only (regexp_replace + split);
                             stays inside whole-stage codegen, no Python.
2. ``tokenize_sql_duckdb`` — the identical transformation as DuckDB SQL,
                             used by the correctness oracle.
3. ``py_tokenize``         — pure-Python reference for the pytest oracle.

Spec (applied in order):
  a. insert a space between an acronym run and a following capitalized word
     ("HTTPResponse" -> "HTTP Response")
  b. insert a space at lower/digit -> upper boundaries
     ("parseHTTP" -> "parse HTTP", "v2Beta" -> "v2 Beta")
  c. lowercase
  d. split on runs of anything outside [a-z0-9]; drop empties
"""

from __future__ import annotations

import hashlib
import re

import pyspark.sql.functions as F
from pyspark.sql import Column

ACRONYM_RE = r"([A-Z]+)([A-Z][a-z])"
CAMEL_RE = r"([a-z0-9])([A-Z])"
SPLIT_RE = r"[^a-z0-9]+"
TOKEN_RE = r"[a-z0-9]+"  # extracting these runs == split on SPLIT_RE + drop empties


# ---------------------------------------------------------------------------
# 1. Spark-native (JVM, codegen'd — the hot path at 100 TB)
# ---------------------------------------------------------------------------

def tokenize_expr(col: Column | str) -> Column:
    """array<string> of lexical tokens; pure built-ins, no UDF.

    Implementation note (measured on 115M tokens, local[32]): `split` alone
    is ~3s, but every per-ELEMENT array pass over its output is 10-25x
    slower — filter(lambda) ~35s (interpreted CodegenFallback),
    array_remove ~54s, regexp_extract_all ~76s. So empties are prevented on
    the STRING side instead: trim leading/trailing separator runs with two
    anchored regexp_replace passes (~1s each), then one split that can
    never produce an empty token. The empty-input guard handles split('')
    -> [''].
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, ACRONYM_RE, r"$1 $2")
    c = F.regexp_replace(c, CAMEL_RE, r"$1 $2")
    c = F.lower(c)
    c = F.regexp_replace(c, r"^[^a-z0-9]+", "")
    c = F.regexp_replace(c, r"[^a-z0-9]+$", "")
    return F.when(c == "", F.array().cast("array<string>")) \
            .otherwise(F.split(c, SPLIT_RE))


def hash_tokens_expr(tokens_col: Column, hex_chars: int = 8) -> Column:
    """liresolr-style hash tokens: each lexical token -> lowercase-hex 32-bit
    bucket (ref: ParallelSolrIndexer.java:197-206 hex-token emission).

    Uses the first ``hex_chars`` hex digits of md5 so the SAME function is
    computable in Spark, DuckDB (oracle) and Python (pytest oracle).
    hex_chars=8 is the full 32-bit bucket space; smaller values coarsen the
    bucket space (the LSH-bucket-width analog).
    """
    return F.transform(tokens_col, lambda t: F.substring(F.md5(t), 1, hex_chars))


def murmur_hash_tokens_expr(tokens_col: Column) -> Column:
    """Fast JVM variant: Murmur3-x86-32 (Spark's `hash`, seed 42) rendered as
    Java `Integer.toHexString` two's-complement lowercase hex — byte-for-byte
    the reference's token format (ref: ParallelSolrIndexer.java:197-206).
    Not DuckDB-checkable; verified against `py_hash_token_murmur` in pytest.
    """
    def to_hex(t):
        h = F.hash(t).cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
        return F.lower(F.conv(h.cast("string"), 10, 16))

    return F.transform(tokens_col, to_hex)


# ---------------------------------------------------------------------------
# 2. DuckDB oracle SQL fragment
# ---------------------------------------------------------------------------

def tokenize_sql_duckdb(expr: str) -> str:
    """DuckDB SQL producing the same token list (use with unnest(...))."""
    return (
        "regexp_extract_all(lower("
        f"regexp_replace(regexp_replace({expr}, "
        r"'([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'), "
        r"'([a-z0-9])([A-Z])', '\1 \2', 'g')"
        f"), '{TOKEN_RE}')"
    )


def hash_token_sql_duckdb(tok_expr: str, hex_chars: int = 8) -> str:
    return f"substr(md5({tok_expr}), 1, {hex_chars})"


# ---------------------------------------------------------------------------
# 3. Pure-Python reference (pytest oracle)
# ---------------------------------------------------------------------------

_ACRO = re.compile(ACRONYM_RE)
_CAMEL = re.compile(CAMEL_RE)
_SPLIT = re.compile(SPLIT_RE)
_TOKEN = re.compile(TOKEN_RE)


def py_tokenize(s: str) -> list[str]:
    s = _ACRO.sub(r"\1 \2", s)
    s = _CAMEL.sub(r"\1 \2", s)
    return _TOKEN.findall(s.lower())


def py_hash_token(tok: str, hex_chars: int = 8) -> str:
    return hashlib.md5(tok.encode("utf-8")).hexdigest()[:hex_chars]


def java_hex32(v: int) -> str:
    """Java Integer.toHexString semantics: lowercase hex of the 32-bit
    two's-complement bit pattern (ref: ParallelSolrIndexer.java:197-206)."""
    return format(v & 0xFFFFFFFF, "x")


def py_hash_token_murmur(tok: str) -> str:
    """Pure-Python Murmur3-x86-32 matching Spark's `hash()` (seed 42,
    Spark's byte-at-a-time tail: each trailing byte is mixed as a full
    sign-extended int, unlike canonical murmur3). Used only to verify
    `murmur_hash_tokens_expr` in tests."""
    data = tok.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = 42

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    def mix_k1(k1):
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = rotl(k1, 15)
        return (k1 * c2) & 0xFFFFFFFF

    def mix_h1(h1, k1):
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    n4 = len(data) // 4
    for i in range(n4):
        k1 = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        h1 = mix_h1(h1, mix_k1(k1))
    # Spark tail: each remaining byte treated as a sign-extended int word
    for b in data[n4 * 4 :]:
        k1 = b - 256 if b >= 128 else b  # sign-extend the byte
        h1 = mix_h1(h1, mix_k1(k1 & 0xFFFFFFFF))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return java_hex32(h1)

"""Columnar text-analysis primitives (tokenize, shingles, quality metrics).

All built-in Spark SQL functions — tokenization and shingling are per-row
array expressions with zero shuffle; only downstream aggregations shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny English stopword list for the heuristic language scorer. Matches the
# hardcoded list in the oracle SQL — keep in sync.
EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "for"]


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def doc_fingerprint(text_col) -> Column:
    """md5 of the sorted distinct token bag — THE document fingerprint
    contract shared by text_fingerprint, dedup_keep_best, and
    dedup_incremental_ingest (and their oracles via llm.O_FINGERPRINT).
    A change here must change all of them together or near-dup joins
    silently stop matching."""
    t = tokens(text_col)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t))))


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles as strings; empty array when fewer than k tokens.

    1-indexed ``element_at`` so the same expression ports to DuckDB lists.
    """
    n = F.size(toks)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def stopword_hits(toks: Column) -> Column:
    """Count of tokens that are English stopwords (duplicates counted)."""
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def avg_token_len(toks: Column) -> Column:
    """Mean token length (exact integer sums, one IEEE division)."""
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return total / F.size(toks)


def greedy_pack(token_counts, capacity: int) -> list[int]:
    """Sequential greedy packing: assign each item (in order) to the
    current bin unless adding it would overflow ``capacity``; then open a
    new bin. An item larger than the capacity occupies its own bin. Pure
    kernel shared by the pack_greedy_capacity operator and its tests."""
    seq, fill, cur = [], 0, 0
    for tok in token_counts:
        if fill > 0 and fill + tok > capacity:
            cur += 1
            fill = tok
        else:
            fill += tok
        seq.append(cur)
    return seq

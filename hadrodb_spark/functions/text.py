"""Text-analysis column functions for the training-data pipeline — all
built on JVM-side ``pyspark.sql.functions`` (codegen-friendly; no Python UDFs
in these hot paths). Each has an exact DuckDB-SQL twin used by the oracles in
:mod:`hadrodb_spark.operators.textops`.

Cross-engine determinism primitives:
- tokenization = ``lower`` + regex split on ``[^a-z0-9]+`` (same regex
  semantics in Java and DuckDB/RE2 for this class)
- hashing = ``md5`` hex strings (identical in both engines; string ``min``
  over hex is the cross-engine minhash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately small + public knowledge; the CASE tie-break order
# (en > de > es > fr) is part of the spec.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "pas", "que", "dans"],
}


def tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens, empties removed."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("bigint")


def stopword_hits(toks: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).cast("bigint")


def lang_id(toks: Column) -> Column:
    """Argmax of stopword-profile hits with fixed tie-break priority."""
    s = {l: stopword_hits(toks, l) for l in STOPWORDS}
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )


def normalize_ws(col: Column) -> Column:
    """Whitespace-collapsed, trimmed, lowercased canonical text."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of canonical text."""
    return F.md5(normalize_ws(col))


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), via transform over an index sequence
    — pure built-ins, no UDF.

    Perf note: ``toks`` is bound ONCE through a single-element transform
    wrapper. Referencing it directly inside the per-index lambda would
    re-evaluate the whole tokenization expression for every ``element_at``
    (Catalyst does no CSE inside higher-order functions, and projection
    collapse re-inlines staged columns) — measured ~20× slower."""

    def over(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(t) - n)
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]),
        )
        # guard: Spark's sequence(0, negative) counts DOWN — short docs must
        # yield an empty shingle set instead
        return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(toks), over), 1)


def _minhash_slices(seeds: int) -> list[tuple[int, int]]:
    """(salt_index, hex_offset) per seed: each md5 yields four disjoint
    8-hex-char (32-bit) slices — 4 independent hash functions per md5 call,
    so ``seeds`` signatures cost ``ceil(seeds/4)`` md5s per shingle instead
    of ``seeds`` (4× less hashing in the map pass)."""
    return [(s // 4, 1 + 8 * (s % 4)) for s in range(seeds)]


def minhash(sh: Column, seeds: int = 8) -> list[Column]:
    """Cross-engine minhash: per seed, the string-min over shingles of a
    32-bit hex slice of md5(shingle [+ salt]). Map-only, no shuffle."""
    def slice_hash(salt: int, off: int):
        # factory closure: Spark inspects the lambda's arity, so it must be
        # exactly one parameter
        return lambda x: F.substring(
            F.md5(x if salt == 0 else F.concat(x, F.lit(f"#{salt}"))), off, 8
        )

    return [
        F.array_min(F.transform(sh, slice_hash(salt, off)))
        for salt, off in _minhash_slices(seeds)
    ]


def minhash_array(sh: Column, seeds: int = 8) -> Column:
    """All ``seeds`` minhash signatures as ONE ``array<string>`` column —
    value-identical to :func:`minhash`, but each shingle is md5'd once per
    SALT instead of once per SEED.

    :func:`minhash` emits one top-level column per seed; Catalyst does no
    CSE across higher-order-function lambdas, so the same md5 is evaluated
    4× (once per 8-hex slice) — measured ~3× slower signature stage at
    sf0.1. Here the salted hex digests are concatenated per shingle inside
    ONE transform, bound once through the single-element-transform wrapper
    (lambda variables are materialized values, immune to projection-collapse
    re-inlining), and the per-seed mins just slice that bound array."""
    n_salts = (seeds + 3) // 4

    def slicer(start: int):
        # factory closure: Spark inspects the lambda's arity, so it must be
        # exactly one parameter
        return lambda s: F.substring(s, start, 8)

    def over(h: Column) -> Column:
        return F.array(
            *[
                F.array_min(F.transform(h, slicer(32 * (s // 4) + 8 * (s % 4) + 1)))
                for s in range(seeds)
            ]
        )

    hcat = F.transform(
        sh,
        lambda x: F.concat(
            *[
                F.md5(x if salt == 0 else F.concat(x, F.lit(f"#{salt}")))
                for salt in range(n_salts)
            ]
        ),
    )
    return F.element_at(F.transform(F.array(hcat), over), 1)


# ---------------------------------------------------------------- SQL twins
def sql_tokens(expr: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT_RE}'), x -> x <> '')"


def sql_stopword_hits(toks_expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, x -> list_contains([{lst}], x)))"


def sql_fingerprint(expr: str) -> str:
    return f"md5(trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g')))"


def sql_shingles(toks_expr: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(generate_series(1, len(t) - {n - 1}), "
        f"i -> {parts})) "
    ).replace("t[", f"({toks_expr})[").replace("len(t)", f"len({toks_expr})")


def sql_minhash(sh_expr: str, seed: int) -> str:
    salt, off = _minhash_slices(seed + 1)[seed]
    inner = "x" if salt == 0 else f"x || '#{salt}'"
    return f"list_min(list_transform({sh_expr}, x -> substr(md5({inner}), {off}, 8)))"

"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Every function is a pure Catalyst expression (no UDFs) and every
floating-point output is derived from exact integer quantities via a
single double division — deterministic and oracle-matchable bit-for-bit.

The language-ID heuristic is marker-word scoring (the n-gram heuristic
family): on real corpora the marker lists would be per-language stopword
sets; the synthetic `documents` table shares one vocabulary across
langs, so the lists below are fixed disjoint subsets — the *plumbing*
(argmax over per-lang overlap scores, deterministic tie-break) is the
operator under test.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mediaplaycounts_spark.operators.dedup import P_MOD, tokens

#: Marker words per language (fixed, deterministic; see module note).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["merge", "slow", "window"],
    "en": ["the", "a", "fast"],
    "es": ["sort", "order", "key"],
    "fr": ["join", "group", "query"],
    "zh": ["vector", "batch", "stream"],
}


def lang_scores(text: str | Column) -> dict[str, Column]:
    t = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def predicted_lang(text: str | Column) -> Column:
    """Argmax over marker scores; ties break by lang code order."""
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic priority: de < en < es < fr < zh
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit(langs[-1])
    for lg in reversed(langs[:-1]):
        expr = F.when(scores[lg] == best, lg).otherwise(expr)
    return expr


def n_words(text: str | Column) -> Column:
    return F.size(tokens(text)).cast("long")


def n_distinct_words(text: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def type_token_ratio(text: str | Column) -> Column:
    """Distinct/total words — exact int division to double."""
    return n_distinct_words(text).cast("double") / n_words(text).cast("double")


def avg_word_len(text: str | Column) -> Column:
    """(len - spaces) / words for single-space-joined text — exact ints."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - (n_words(text) - 1)).cast("double") / n_words(text).cast(
        "double"
    )


def quality_score(text: str | Column) -> Column:
    """0..1 heuristic: type-token ratio + capped average word length.

    Mirrors the length/stopword-ratio scoring used by LLM-data pipelines
    (e.g. C4/Gopher-style rules), reduced to the signals present in the
    synthetic corpus.
    """
    ttr = type_token_ratio(text)
    awl = F.least(avg_word_len(text) / F.lit(10.0), F.lit(1.0))
    return ttr * F.lit(0.5) + awl * F.lit(0.5)


#: BPE-ish token regex: letter runs, single digits, other symbols.
BPE_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def token_counts(text: str | Column) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_ws_tokens": n_words(c),
        "n_bpe_tokens": F.regexp_count(c, F.lit(BPE_PATTERN)).cast("long"),
        "est_tokens_len4": F.ceil(F.length(c) / F.lit(4.0)).cast("long"),
    }


def fingerprint(text: str | Column) -> Column:
    """Rolling polynomial hash over the token stream (mod 1e9+7).

    h = fold(h * 31 + (17*len(w) + ascii(w[0]))) — integer-only, cheap,
    and expressible identically in ANSI SQL (per-token values stay far
    below 2^63, so no overflow on either engine).
    """
    vals = F.transform(
        tokens(text), lambda w: F.length(w).cast("long") * 17 + F.ascii(w)
    )
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 31 + v) % F.lit(P_MOD).cast("long"),
    )

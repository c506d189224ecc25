"""Text analysis operators: token counting, quality scoring, language id,
document fingerprinting.

All pure Catalyst expressions (whole-stage codegen, no python in the hot
path) and all reproducible in ANSI SQL — every operator here has an exact
DuckDB oracle. Reference lineage: per-feature stats driving encode decisions
(JtsGeomStats.java:48-153) generalize to per-document quality stats driving
corpus filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny fixed stopword lists for the language-id heuristic (deterministic,
# oracle-expressible)
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for", "it", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "de", "et", "est", "pas", "pour", "une", "dans"],
}


def token_count(col):
    """Whitespace tokens; empty/blank string counts 0."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(col), r"\s+")))


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len) per document."""
    c = F.col(text_col)
    toks = token_count(c)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        toks.alias("n_tokens"),
        F.round(F.when(toks > 0, F.length(F.trim(c)) / toks).otherwise(F.lit(None)), 6)
         .alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + a composite score.

    - digit_ratio / punct_ratio via regexp-strip length deltas
    - stopword_hits: membership count against a tiny english list
    - score: length-normalized combination, rounded for oracle stability
    """
    c = F.col(text_col)
    n = F.length(c)
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    toks = F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.lower(F.trim(c)), r"\s+"))
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks),
                                         F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    score = (F.when(n > 0,
                    1.0 - digits / n - punct / n
                    + F.least(stop_hits, F.lit(5)) * 0.02)
             .otherwise(F.lit(0.0)))
    return df.select(
        F.col(id_col), n.alias("n_chars"),
        F.round(F.when(n > 0, digits / n).otherwise(0.0), 6).alias("digit_ratio"),
        F.round(F.when(n > 0, punct / n).otherwise(0.0), 6).alias("punct_ratio"),
        stop_hits.alias("stopword_hits"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-vote language id over {en,de,fr}, 'und' (undetermined) when
    no list scores >0. Deterministic tie-break by language code order."""
    c = F.col(text_col)
    toks = F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.lower(F.trim(c)), r"\s+"))
    toks_d = F.array_distinct(toks)
    hits = {lang: F.size(F.array_intersect(
                toks_d, F.array(*[F.lit(w) for w in ws])))
            for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(STOPWORDS):  # deterministic order
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return df.select(F.col(id_col), *[hits[l].alias(f"hits_{l}") for l in sorted(STOPWORDS)],
                     pred.alias("lang_pred"))


def fingerprint(df: DataFrame, text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """Document fingerprints:
    - md5_full: content hash of the exact text bytes
    - min_gram_md5: winnowing-style fingerprint = min md5 over char k-grams
      (stable under document reordering; both reproducible in SQL)
    """
    c = F.col(text_col)
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 0)),"
        f" i -> substring({text_col}, i, {k}))")
    return df.select(
        F.col(id_col),
        F.md5(c.cast("binary")).alias("md5_full"),
        F.array_min(F.transform(grams, lambda g: F.md5(g.cast("binary"))))
         .alias("min_gram_md5"),
    )

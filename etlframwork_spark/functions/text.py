"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

Everything is expressed with built-in JVM functions (split / lambda
higher-order functions / md5) so the plan stays in whole-stage codegen;
each op has a DuckDB oracle with identical integer/string semantics
(int-derived doubles divide identically in IEEE, so ratios are safe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.registry import query
from ..sources.io import load_table

# per-language marker words for the n-gram/stopword language heuristic
_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "los", "las", "y", "una", "que"),
}


def _tokens_expr() -> str:
    return r"split(trim(text), '\\s+')"


def _hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"size(filter(_tokens, t -> t in ({words})))"


def _duck_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_filter(_tokens, t -> t in ({words})))"


# ---------------------------------------------------------------- token stats
@query(
    "docs_token_stats",
    oracle=r"""
    WITH t AS (
        SELECT lang, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               length(text) AS n_chars
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM t GROUP BY lang
    """,
)
def docs_token_stats(spark, sf_dir):
    """Whitespace token counting + per-language corpus stats."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    t = d.select(
        "lang",
        F.expr(f"size({_tokens_expr()})").alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ----------------------------------------- quality score + fingerprint
@query(
    "docs_quality_fingerprint",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS _tokens,
               length(text) AS n_chars,
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS _norm
        FROM documents
    )
    SELECT doc_id,
           len(_tokens) AS n_tokens,
           n_chars,
           CAST(n_chars AS DOUBLE) / len(_tokens) AS chars_per_token,
           CAST(len(list_filter(_tokens, t -> t in ('the','and','of','to','in','is','a'))) AS DOUBLE)
               / len(_tokens) AS stopword_ratio,
           CAST(len(list_filter(_tokens, t -> length(t) > 2)) AS DOUBLE)
               / len(_tokens) AS long_token_ratio,
           CASE WHEN len(_tokens) BETWEEN 5 AND 10000 AND n_chars >= 20 THEN 1 ELSE 0 END AS quality_ok,
           md5(_norm) AS fp,
           length(_norm) AS norm_len
    FROM t
    """,
)
def docs_quality_fingerprint(spark, sf_dir):
    """Per-document quality signals (length, stopword ratio, token shape)
    plus the canonical-form fingerprint (lowercase, collapse whitespace,
    md5 — the exact-dedup key at corpus scale). One map-only pass; ratios
    are int/int divisions — IEEE-identical across engines. (Round-3 fold
    of the former docs_quality_score + docs_fingerprint queries: same
    granularity, same table, one registry slot — registry capped at 50.)"""
    d = load_table(spark, sf_dir, "documents", spread=True)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    t = d.select(
        "doc_id",
        F.expr(_tokens_expr()).alias("_tokens"),
        F.length("text").alias("n_chars"),
        norm.alias("_norm"),
    )
    n_tokens = F.size("_tokens")
    return t.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.col("n_chars").cast("double") / n_tokens).alias("chars_per_token"),
        (F.expr(_hits("en")).cast("double") / n_tokens).alias("stopword_ratio"),
        (F.expr("size(filter(_tokens, t -> length(t) > 2))").cast("double") / n_tokens).alias(
            "long_token_ratio"
        ),
        F.when((n_tokens.between(5, 10000)) & (F.col("n_chars") >= 20), 1).otherwise(0).alias("quality_ok"),
        F.md5("_norm").alias("fp"),
        F.length("_norm").cast("long").alias("norm_len"),
    )


# ----------------------------------------------------------------- language id
_LANGID_DUCK = r"""
    WITH t AS (
        SELECT doc_id, lang AS labeled_lang,
               regexp_split_to_array(trim(lower(text)), '\s+') AS _tokens
        FROM documents
    ), s AS (
        SELECT doc_id, labeled_lang,
               {en} AS h_en, {de} AS h_de, {fr} AS h_fr, {es} AS h_es
        FROM t
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en > 0 THEN 'en'
                WHEN h_de >= h_fr AND h_de >= h_es AND h_de > 0 THEN 'de'
                WHEN h_fr >= h_es AND h_fr > 0 THEN 'fr'
                WHEN h_es > 0 THEN 'es'
                ELSE 'unknown' END AS detected_lang,
           h_en, h_de, h_fr, h_es
    FROM s
    """


@query(
    "docs_language_id",
    oracle=_LANGID_DUCK.format(
        en=_duck_hits("en"), de=_duck_hits("de"), fr=_duck_hits("fr"), es=_duck_hits("es")
    ),
)
def docs_language_id(spark, sf_dir):
    """Marker-word language heuristic with a deterministic preference
    order (en > de > fr > es > unknown) for ties."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    t = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.expr(r"split(trim(lower(text)), '\\s+')").alias("_tokens"),
    )
    s = t.select(
        "doc_id",
        "labeled_lang",
        F.expr(_hits("en")).cast("long").alias("h_en"),
        F.expr(_hits("de")).cast("long").alias("h_de"),
        F.expr(_hits("fr")).cast("long").alias("h_fr"),
        F.expr(_hits("es")).cast("long").alias("h_es"),
    )
    detected = (
        F.when((F.col("h_en") >= F.col("h_de")) & (F.col("h_en") >= F.col("h_fr")) & (F.col("h_en") >= F.col("h_es")) & (F.col("h_en") > 0), "en")
        .when((F.col("h_de") >= F.col("h_fr")) & (F.col("h_de") >= F.col("h_es")) & (F.col("h_de") > 0), "de")
        .when((F.col("h_fr") >= F.col("h_es")) & (F.col("h_fr") > 0), "fr")
        .when(F.col("h_es") > 0, "es")
        .otherwise("unknown")
    )
    return s.select("doc_id", "labeled_lang", detected.alias("detected_lang"), "h_en", "h_de", "h_fr", "h_es")


# ---------------------------------------------------------------- fingerprint
def docs_fingerprint(spark, sf_dir):
    """Canonical-form document fingerprint: lowercase, collapse whitespace,
    md5 — the exact-dedup key at corpus scale. NOT driver-registered:
    folded into docs_quality_fingerprint (registry capped at 50)."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fp"), F.length(norm).cast("long").alias("norm_len"))

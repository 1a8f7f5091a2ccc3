"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting. Pure built-in expressions (JVM-side, codegen'd) —
one linear pass each; the DuckDB oracles recompute the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators.dedup import (
    MERSENNE31,
    SQL_TOKENS,
    portable_hash,
    sql_portable_hash,
    tokens,
)

# Minimal function-word lists per language (public, standard closed-class
# words). Order = tie-break precedence.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que", "les", "dans"),
}


def _overlap(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def _sql_overlap(toks: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def language_id(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language heuristic: count function-word hits per
    language (token-frequency weighted), pick the max; 'und' (undetermined)
    when nothing matches. Deterministic tie-break by the STOPWORDS order."""
    toks = tokens(F.col(text_col))
    scored = df.select(
        F.col(id_col).alias("doc"),
        *[_overlap(toks, ws).alias(f"hits_{lang}") for lang, ws in STOPWORDS.items()],
    )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc", *[f"hits_{lang}" for lang in langs], pred.alias("pred_lang")
    )


def sql_language_id(id_col: str, text_col: str, table: str = "documents") -> str:
    toks = SQL_TOKENS.format(text=text_col)
    langs = list(STOPWORDS)
    hits = ",\n  ".join(
        f"{_sql_overlap(toks, ws)} AS hits_{lang}" for lang, ws in STOPWORDS.items()
    )
    best = f"greatest({', '.join(f'hits_{lang}' for lang in langs)})"
    # mirror the when-chain: earliest language in STOPWORDS wins ties
    case = "CASE "
    for lang in langs:
        case += f"WHEN hits_{lang} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    cols = ", ".join(f"hits_{lang}" for lang in langs)
    return f"""
WITH scored AS (SELECT {id_col} AS doc, {hits} FROM {table})
SELECT doc, {cols}, {case} AS pred_lang FROM scored
"""


def quality_scores(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, token stats, type-token ratio,
    alpha ratio, English-stopword ratio, composite score."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    distinct_ratio = F.round(F.size(F.array_distinct(toks)) / n_tok, 6)
    avg_tok_len = F.round(
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / n_tok,
        6,
    )
    stop_ratio = F.round(_overlap(toks, STOPWORDS["en"]) / n_tok, 6)
    score = F.round(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + stop_ratio * 0.2,
        6,
    )
    return df.select(
        F.col(id_col).alias("doc"),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        avg_tok_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def sql_quality_scores(id_col: str, text_col: str, table: str = "documents") -> str:
    toks = SQL_TOKENS.format(text=text_col)
    stop = _sql_overlap("toks", STOPWORDS["en"])
    return f"""
WITH t AS (SELECT {id_col} AS doc, {text_col} AS txt, {toks} AS toks FROM {table})
SELECT doc,
  length(txt) AS n_chars,
  len(toks) AS n_tokens,
  round(len(list_distinct(toks)) / len(toks)::DOUBLE, 6) AS distinct_ratio,
  round(list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> length(t)::BIGINT)),
                    (a, x) -> a + x) / len(toks)::DOUBLE, 6) AS avg_token_len,
  round({stop} / len(toks)::DOUBLE, 6) AS stopword_ratio,
  round(least(len(toks) / 100.0, 1.0) * 0.4
        + round(len(list_distinct(toks)) / len(toks)::DOUBLE, 6) * 0.4
        + round({stop} / len(toks)::DOUBLE, 6) * 0.2, 6) AS quality
FROM t
"""


def fingerprint(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint: left fold
    ``acc = (acc * 131 + h(token)) mod (2^31-1)`` over the token sequence —
    a content+order signature that is stable under re-partitioning
    (per-row computation, no aggregation)."""
    toks = tokens(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * 131 + F.pmod(portable_hash(t, "fp_"), F.lit(MERSENNE31)),
            F.lit(MERSENNE31),
        ),
    )
    return df.select(F.col(id_col).alias("doc"), fp.alias("fingerprint"))


def sql_fingerprint(id_col: str, text_col: str, table: str = "documents") -> str:
    toks = SQL_TOKENS.format(text=text_col)
    h = sql_portable_hash("t", "fp_")
    return f"""
SELECT {id_col} AS doc,
  list_reduce(
    list_prepend(0::BIGINT, list_transform({toks}, t -> ({h}) % {MERSENNE31})),
    (acc, x) -> (acc * 131 + x) % {MERSENNE31}
  ) AS fingerprint
FROM {table}
"""


def token_stats(df: DataFrame, *, text_col: str, group_col: str) -> DataFrame:
    """Corpus-level token statistics per group (lang/source): documents,
    total/distinct tokens, avg doc length."""
    toks = tokens(F.col(text_col))
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        F.size(toks).alias("n_tok"),
        toks.alias("toks"),
    )
    exploded = per_doc.select("grp", F.explode("toks").alias("t"))
    vocab = exploded.groupBy("grp").agg(
        F.countDistinct("t").alias("vocab_size"), F.count(F.lit(1)).alias("total_tokens")
    )
    docs = per_doc.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tok"), 6).alias("avg_doc_tokens"),
    )
    return docs.join(vocab, "grp")

"""Text-analysis operators for training-data pipelines.

All pure Catalyst column expressions (no UDFs): token counting,
quality metrics, language id, and document fingerprinting run
JVM-side at scan speed. Hash/fold primitives are chosen for bit-exact
cross-engine reproducibility (md5-prefix BIGINT, sequential folds) so
every operator has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "STOPWORDS",
    "token_hash_expr",
    "with_token_count",
    "with_quality",
    "with_lang_id",
    "with_fingerprint",
]

# tiny embedded stopword lists (language-id heuristic)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"],
}


def token_hash_expr(col: str) -> str:
    """Deterministic 60-bit token hash, identical in Spark and DuckDB."""
    return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"


def token_hash_expr_duckdb(col: str) -> str:
    return f"(('0x' || substring(md5({col}), 1, 15))::bigint)"


def with_token_count(df: DataFrame, text: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (single-space separated corpus)."""
    return df.withColumn(out, F.size(F.split(F.col(text), " ")))


def with_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality metrics: char/token counts, punctuation count, stopword
    count, stopword ratio. Integers except the final ratio (one
    division — cross-engine exact)."""
    toks = F.split(F.col(text), " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(toks, stop))  # distinct-stopword hits
    return (
        df.withColumn("n_chars", F.length(text))
        .withColumn("n_tokens", F.size(toks))
        .withColumn(
            "n_punct",
            F.length(text) - F.length(F.regexp_replace(F.col(text), "[.,;:!?]", "")),
        )
        .withColumn("n_stop", n_stop)
        .withColumn(
            "stop_ratio", F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")
        )
    )


def with_lang_id(df: DataFrame, text: str = "text", out: str = "pred_lang") -> DataFrame:
    """Stopword-vote language id; deterministic tie-break en > de > fr."""
    toks = F.split(F.col(text), " ")
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in words])))
        for lang, words in STOPWORDS.items()
    }
    best = (
        F.when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), F.lit("en"))
        .when(scores["de"] >= scores["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumn(out, best)


def with_fingerprint(df: DataFrame, text: str = "text", out: str = "fingerprint") -> DataFrame:
    """Rolling polynomial hash over characters (mod 2^31-1): a
    sequential fold, bit-identical to DuckDB's list_reduce oracle."""
    return df.withColumn(
        out,
        F.expr(
            f"aggregate(split({text}, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % 2147483647)"
        ),
    )


def fingerprint_sql_duckdb(text: str = "text") -> str:
    # accumulator must be BIGINT or acc*31 overflows INT32 in DuckDB
    return (
        f"list_reduce(list_prepend(0::bigint, list_transform(string_split({text}, ''), "
        f"c -> ascii(c)::bigint)), (acc, v) -> (acc * 31 + v) % 2147483647)"
    )

"""Text-analysis operators for a training-data pipeline: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

Everything is JVM expressions (split / filter / aggregate / md5) — a 100 TB
corpus pays zero Python tax here. Ratios are computed as exact integer
divisions (both operands integral) so results are bit-identical across
engines, then rounded for presentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from belb_spark.operators.blocking import shingles_col
from belb_spark.operators.dedup import tokens_col

STOPWORDS = ["the", "a"]


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, avg_token_len, stopword_ratio, short_ratio)."""
    t = tokens_col(text_col)
    n = F.size(t)
    stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    short = F.size(F.filter(t, lambda x: F.length(x) <= 3))
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, b: a + b
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        F.round(total_len / n, 4).alias("avg_token_len"),
        F.round(stop / n, 4).alias("stopword_ratio"),
        F.round(short / n, 4).alias("short_ratio"),
    )


def lang_id_heuristic(
    df: DataFrame, id_col: str, text_col: str, lang_col: str = "lang"
) -> DataFrame:
    """Stopword-ratio language guess (n-gram-heuristic family): en iff
    stopword density ≥ 5%. Output (doc_id, pred_lang, matches)."""
    t = tokens_col(text_col)
    ratio = F.size(F.filter(t, lambda x: x.isin(STOPWORDS))) / F.size(t)
    pred = F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        (pred == F.col(lang_col)).alias("matches"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (ceil(chars/4) —
    the usual ~4-chars-per-token rule). Output (doc_id, n_tokens, est_bpe)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
        F.ceil(F.length(text_col) / 4.0).cast("long").alias("est_bpe"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str, width: int = 4
) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over width-token shingles of the
    lowercased text (rolling-hash family, engine-portable).
    Output (doc_id, fingerprint). Docs shorter than ``width`` tokens
    fingerprint their whole text (shingles_col short-doc semantics); docs
    with NO tokens produce no row (matches the oracle's GROUP BY)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    sh = shingles_col(toks, width)
    # drop zero-token docs on the CHEAP predicate before the projection:
    # filtering on fingerprint IS NOT NULL would be pushed below the
    # projection by Catalyst, substituting the alias and evaluating the
    # whole shingle+md5 expression twice per row (measured 2×)
    return df.filter(F.size(toks) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("fingerprint"),
    )


def unigram_freq_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-unigram frequency score per doc — the language-model-ish
    quality signal a pretraining pipeline uses to flag boilerplate (docs
    dominated by corpus-frequent tokens score high, rare-token docs low).

    score = mean over the doc's tokens of corpus_count(token). All integer
    arithmetic until one final exact-integer division (bit-identical across
    engines — a log-prob variant would hinge on ln() agreeing between libm
    and the JVM, which IEEE does not guarantee). Output
    (doc_id, n_tokens, sum_freq, mean_freq).

    Scale shape: token counts are a groupBy over the exploded slim (token)
    table; the per-doc attach is a broadcast-able join when the vocabulary
    is dictionary-sized, a shuffle join otherwise — no Python either way.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    exploded = toks.select("doc_id", F.explode("t").alias("tok"))
    counts = exploded.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    per_doc = (
        exploded.join(counts, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").alias("sum_freq"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        F.round(F.col("sum_freq") / F.col("n_tokens"), 4).alias("mean_freq"),
    )


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 5,
) -> DataFrame:
    """Test-set contamination check: fraction of each doc's distinct token
    ``width``-grams that appear in ANY benchmark document — the standard
    n-gram-overlap decontamination pass before pretraining. Output
    (doc_id, n_shingles, n_overlap, overlap_ratio), exact integers + one
    final division.

    Scale shape: both sides reduce to slim (shingle) tables; the benchmark
    side is distinct-deduped and the membership test is a broadcast-able
    left-semi join (benchmarks are small next to a 100 TB corpus)."""
    d_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(tokens_col(text_col), width)).alias("s"),
    )
    b_sh = (
        bench.select(F.explode(shingles_col(tokens_col(text_col), width)).alias("s"))
        .distinct()
    )
    hits = d_sh.join(b_sh, "s", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    totals = d_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)) / F.col("n_shingles"), 4
            ).alias("overlap_ratio"),
        )
    )


def repetition_score(
    df: DataFrame, id_col: str, text_col: str, width: int = 3
) -> DataFrame:
    """Repetition-based quality filter: fraction of a doc's token
    ``width``-grams that are duplicates of an earlier gram — the standard
    boilerplate/spam signal (Gopher-style repetition rules reduced to one
    exact statistic). Output (doc_id, n_grams, n_distinct, dup_ratio);
    docs with fewer than ``width`` tokens emit no row (no gram exists).

    All-integer until one final division, so the DuckDB twin is
    bit-identical. Pure codegen: the gram list is a higher-order transform
    over ``sequence`` (no explode, no Python); ``element_at`` indices are
    bounded by the sequence endpoints AND the pushed ``size >= width``
    filter, so the expression is ANSI-safe."""
    t = tokens_col(text_col)
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - (width - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(width)]
        ),
    )
    total = n - (width - 1)
    distinct = F.size(F.array_distinct(grams))
    return df.filter(n >= width).select(
        F.col(id_col).alias("doc_id"),
        total.cast("long").alias("n_grams"),
        distinct.cast("long").alias("n_distinct"),
        F.round((total - distinct) / total, 4).alias("dup_ratio"),
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-[0-9]{3}-[0-9]{4}"


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrub for a pretraining corpus: count and redact email addresses
    and NANP-style phone numbers with fixed placeholders. Output
    (doc_id, n_emails, n_phones, redacted). Both regexes are
    dialect-portable (plain character classes — identical semantics under
    Java regex and RE2, so the DuckDB twin matches byte for byte); the
    whole stage is JVM codegen, zero Python."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ).alias("redacted"),
    )

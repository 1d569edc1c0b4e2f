"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2 +
training-data-pipeline ops) over the driver's testdata tables;
``oracle_sql()`` carries the DuckDB twin of each query. Both sides are
written for *bit-identical* results:

- integer outputs are BIGINT on both sides;
- monetary aggregates are summed as DECIMAL (exact, order-independent) and
  cast to double only at the output boundary;
- ratios divide two integers (exact same double both sides);
- hashes are md5 hex strings (lexicographic min == numeric min), so MinHash/
  SimHash/fingerprints are engine-portable with no integer casts.

Ops that are genuinely iterative (connected components to fixpoint) use a
recursive-CTE oracle; the streaming job has no SQL twin (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from belb_spark.operators import relational as R
from belb_spark.operators.clustering import connected_components
from belb_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
    synset_clusters,
)
from belb_spark.operators.similarity import (
    cosine_topk,
    embedding_cosine_pairs,
    ivf_topk,
    srp_ann_topk,
    srp_lsh_buckets,
    srp_weights,
)
from belb_spark.operators.text import (
    doc_fingerprint,
    lang_id_heuristic,
    text_quality,
    token_counts,
)

# ----------------------------------------------------------------- helpers

MINHASH_PERMS = 8
MINHASH_BAND = 2
NGRAM_W = 5
HIGH = "('8','9','a','b','c','d','e','f')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata ships as ONE small parquet file = one input split; fan out to
    # all cores before the expression-heavy ops (at real scale the source is
    # already many splits and this repartition is dropped at the loader)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same single-split workaround as _docs: the testdata embeddings file is
    # ONE parquet row group, so every scan is one task and the (interpreted
    # higher-order) dot-product towers downstream run single-core — measured
    # 2-4x the query wall at sf1.0. At real scale the source has >= cores
    # splits and this repartition is dropped at the loader.
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


# --------------------------------------------------------- spark queries


def q_exact_dedup(spark, sf_dir):
    out = exact_dedup(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("rep_id").cast("long"),
        F.col("group_size").cast("long"),
    )


def q_synset_clusters(spark, sf_dir):
    out = synset_clusters(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(F.col("id").cast("long").alias("doc_id"), F.col("cluster").cast("long"))


def q_minhash_pairs(spark, sf_dir):
    out = minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", MINHASH_PERMS, MINHASH_BAND, 3, 0.2
    )
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard"
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    out = ngram_jaccard_pairs(_docs(spark, sf_dir), "doc_id", "text", NGRAM_W, 0.3)
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard"
    )


def q_simhash(spark, sf_dir):
    out = simhash16(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(F.col("id").cast("long").alias("doc_id"), F.col("simhash").cast("long"))


def q_cc_clusters(spark, sf_dir):
    """Near-dup clusters: CC over ngram-jaccard edges (iterative large-star/
    small-star — the pipeline's clustering operator on real testdata)."""
    docs = _docs(spark, sf_dir)
    edges = ngram_jaccard_pairs(docs, "doc_id", "text", NGRAM_W, 0.3).select(
        F.col("id_a").alias("uid_a"), F.col("id_b").alias("uid_b")
    )
    nodes = docs.select(F.col("doc_id").alias("uid"))
    out = connected_components(edges, nodes)
    return out.select(
        F.col("uid").cast("long").alias("doc_id"), F.col("cluster").cast("long")
    )


def q_ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return cosine_topk(
        emb.filter(F.col("vec_id") >= 10), emb.filter(F.col("vec_id") < 10), k=5
    ).select(
        F.col("query_id").cast("long"),
        F.col("vec_id").cast("long"),
        F.col("rank").cast("long"),
        "cosine",
    )


def q_srp_buckets(spark, sf_dir):
    out = srp_lsh_buckets(_emb(spark, sf_dir), n_planes=8, dim=64)
    return out.select(F.col("vec_id").cast("long"), F.col("bucket").cast("long"))


def q_srp_ann_topk(spark, sf_dir):
    """ANN search path: SRP bucket-equi-join candidates, exact cosine
    re-rank within the bucket (similarity.py srp_ann_topk)."""
    emb = _emb(spark, sf_dir)
    out = srp_ann_topk(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_planes=8,
        dim=64,
    )
    return out.select(
        F.col("query_id").cast("long"),
        F.col("vec_id").cast("long"),
        F.col("rank").cast("long"),
        "cosine",
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN (similarity.ivf_topk): corpus inverted by deterministic
    coarse cells (first-8-by-id centroids — the k-means slot), queries probe
    their 2 nearest cells, exact cosine re-rank within the probed cells."""
    emb = _emb(spark, sf_dir)
    out = ivf_topk(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_cells=8,
        n_probe=2,
    )
    return out.select(
        F.col("query_id").cast("long"),
        F.col("vec_id").cast("long"),
        F.col("rank").cast("long"),
        "cosine",
    )


def q_min_code_assembly(spark, sf_dir):
    """A12 literal UMLS min-code synset assembly (kb.min_code_assembly) over
    an events-derived dictionary: identifier=user_id, name=event_type,
    description=floor(value) — min code per name, lexicographically-min name
    promoted to symbol (code 0) for identifiers lacking one."""
    from belb_spark.operators.kb import min_code_assembly

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = events.select(
        F.col("user_id").alias("identifier"),
        F.col("event_type").alias("name"),
        F.floor("value").cast("long").alias("description"),
    )
    out = min_code_assembly(d, symbol_code=0)
    return out.select(
        F.col("identifier").cast("long"),
        "name",
        F.col("description").cast("long"),
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs: SRP-bucket blocking over TWO unioned
    plane sets (LSH band tables for vectors) + exact cosine verify (the
    vector twin of minhash-LSH dedup)."""
    out = embedding_cosine_pairs(
        _emb(spark, sf_dir), min_cosine=0.2, n_planes=8, dim=64, n_tables=2
    )
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "cosine"
    )


def _overlap_frames(spark, sf_dir):
    """Clicks as 600s intervals, signups as 3600s intervals, per user."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_timestamp("ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        sec.alias("c_start"),
        (sec + 600).alias("c_end"),
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        sec.alias("s_start"),
        (sec + 3600).alias("s_end"),
    )
    return clicks, signups


def q_events_overlap_join(spark, sf_dir):
    """J7 literal interval-overlap join (range-bucketed equi-join path)."""
    from belb_spark.operators.temporal import overlap_join

    clicks, signups = _overlap_frames(spark, sf_dir)
    out = overlap_join(
        clicks, signups, "user_id", "c_start", "c_end", "s_start", "s_end",
        bucket_size=1800,
    )
    return out.select(
        F.col("click_id").cast("long"),
        F.col("signup_id").cast("long"),
        (F.least("c_end", "s_end") - F.greatest("c_start", "s_start"))
        .cast("long")
        .alias("overlap_sec"),
    )


def q_events_overlap_anti(spark, sf_dir):
    """U3 overlap-based subtraction: clicks no signup window touches."""
    from belb_spark.operators.temporal import overlap_anti_join

    clicks, signups = _overlap_frames(spark, sf_dir)
    out = overlap_anti_join(
        clicks, signups, "user_id", "c_start", "c_end", "s_start", "s_end",
        bucket_size=1800,
    )
    return out.select(
        F.col("click_id").cast("long"), F.col("user_id").cast("long")
    )


def _derived_spans(spark, sf_dir):
    """Deterministic span fixture over documents: two fixed spans [5,12) and
    [20,28) per doc with ≥28 chars (second glued/overlap behavior exercised
    by whatever the corpus text happens to contain at those offsets)."""
    docs = _docs(spark, sf_dir).filter(F.col("n_chars") >= 28).select("doc_id", "text")
    spans = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("span_id"),
                    F.lit(5).cast("long").alias("start"),
                    F.lit(12).cast("long").alias("end"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("span_id"),
                    F.lit(20).cast("long").alias("start"),
                    F.lit(28).cast("long").alias("end"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.*")
    return docs, spans


def q_spans_clean_iwm(spark, sf_dir):
    """T1 CleanIntraWordMentions over derived spans: whitespace repair +
    offset remap; compared value-by-value against an arithmetic SQL twin."""
    from belb_spark.operators.spans import clean_intra_word_spans

    docs, spans = _derived_spans(spark, sf_dir)
    out = clean_intra_word_spans(docs, spans)
    return out.filter(F.col("span_id").isNotNull()).select(
        F.col("doc_id").cast("long"),
        F.col("span_id").cast("long"),
        F.col("start").cast("long"),
        F.col("end").cast("long"),
        "span_text",
        F.md5("text").alias("text_md5"),
    )


def q_spans_mark(spark, sf_dir):
    """T3 AddMentionMarkers over derived spans ([MS]/[ME] injection)."""
    from belb_spark.operators.spans import mark_spans

    docs, spans = _derived_spans(spark, sf_dir)
    out = mark_spans(docs, spans)
    return out.filter(F.col("span_id").isNotNull()).select(
        F.col("doc_id").cast("long"),
        F.col("span_id").cast("long"),
        F.col("start").cast("long"),
        F.col("end").cast("long"),
        "span_text",
        F.md5("text").alias("text_md5"),
    )


def q_spans_chain(spark, sf_dir):
    """T4 transform protocol (pipeline stage composition, reference
    belb/preprocessing/data.py transform chaining): T1 clean → T3 mark,
    chained through the shared (docs, spans) contract — stage N+1
    consumes stage N's rewritten text and remapped offsets unchanged,
    so offsets survive composition. The oracle composes the same two
    arithmetic rewrites in one SQL expression."""
    from belb_spark.operators.spans import clean_intra_word_spans, mark_spans

    docs, spans = _derived_spans(spark, sf_dir)
    cleaned = clean_intra_word_spans(docs, spans)
    docs2 = cleaned.select("doc_id", "text").dropDuplicates(["doc_id"])
    spans2 = cleaned.filter(F.col("span_id").isNotNull()).select(
        "doc_id", "span_id", "start", "end"
    )
    out = mark_spans(docs2, spans2)
    return out.filter(F.col("span_id").isNotNull()).select(
        F.col("doc_id").cast("long"),
        F.col("span_id").cast("long"),
        F.col("start").cast("long"),
        F.col("end").cast("long"),
        "span_text",
        F.md5("text").alias("text_md5"),
    )


def q_spans_sentences(spark, sf_dir):
    """T2 SplitIntoSentences over a deterministically punctuated text (the
    corpus text itself has no sentence punctuation): exercises the real
    split, abbreviation suppression ('Dr.', 'vs.'), digit suppression
    ('3. 14'), lowercase-continuation suppression ('rose! <lowercase>'),
    span-overlap merging (span [40,50) straddles the '. Then' cut), and the
    r4 extensions — single-letter/initial suppression ('U.S. Navy'), a
    closing quote after the terminator ('said "Stop." 文'), and CJK
    terminators splitting with no following space ('文。次'). The oracle
    re-implements the full boundary rule generically in SQL (abbreviation
    IN-list generated from spans.ABBREVIATIONS — lockstep by construction).
    """
    from belb_spark.operators.spans import split_sentences

    docs = _docs(spark, sf_dir).filter(F.col("n_chars") >= 48)
    text2 = F.concat(
        F.lit("Dr. Who saw "),
        F.substring("text", 1, 30),
        F.lit(". Then vs. 3. 14 rose! "),
        F.substring("text", 31, 40),
        F.lit('? End here. U.S. Navy said "Stop." 文。次 came. Yes.'),
    )
    docs2 = docs.select("doc_id", text2.alias("text"))
    spans = docs2.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("span_id"),
                    F.lit(40).cast("long").alias("start"),
                    F.lit(50).cast("long").alias("end"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("span_id"),
                    F.lit(5).cast("long").alias("start"),
                    F.lit(9).cast("long").alias("end"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.*")
    out = split_sentences(docs2, spans)
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("sent_id").cast("long"),
        F.col("sent_start").cast("long"),
        F.col("sent_end").cast("long"),
        "sent_text",
    )


def q_text_quality(spark, sf_dir):
    out = text_quality(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("n_tokens").cast("long"),
        "avg_token_len",
        "stopword_ratio",
        "short_ratio",
    )


def q_lang_id(spark, sf_dir):
    return lang_id_heuristic(_docs(spark, sf_dir), "doc_id", "text").select(
        F.col("doc_id").cast("long"), "pred_lang", "matches"
    )


def q_token_counts(spark, sf_dir):
    return token_counts(_docs(spark, sf_dir), "doc_id", "text").select(
        F.col("doc_id").cast("long"),
        F.col("n_tokens").cast("long"),
        F.col("est_bpe").cast("long"),
    )


def q_fingerprint(spark, sf_dir):
    return doc_fingerprint(_docs(spark, sf_dir), "doc_id", "text", 4).select(
        F.col("doc_id").cast("long"), "fingerprint"
    )


# --------------------------------------------------- source-format queries
# Fixture files (scripts/make_source_fixtures.py — deterministic, committed)
# give every bespoke reader an oracle row: the Spark side exercises the real
# reader (Hadoop record delimiter, stdlib-XML mapInPandas), the DuckDB twin
# re-parses the same bytes (or, for BioC, the JSON serialization of the same
# collection) with SQL string/JSON functions.
import pathlib as _pathlib

FIXTURES = str(_pathlib.Path(__file__).resolve().parent / "tests" / "fixtures")


def q_src_kv_records(spark, sf_dir):
    """S4 multi-line ``//``-terminated records + key-value line parsing
    (Cellosaurus style, readers.read_delimited_records + parse_kv_records)."""
    from belb_spark.sources.readers import parse_kv_records, read_delimited_records

    recs = read_delimited_records(spark, f"{FIXTURES}/records.txt", "\n//\n")
    kv = parse_kv_records(recs)
    m = kv.groupBy("rid").agg(
        F.map_from_entries(
            F.collect_list(F.struct("k", F.col("vals")[0].alias("v")))
        ).alias("m")
    )
    return m.select(
        F.col("m")["ID"].alias("name"),
        F.col("m")["AC"].alias("ac"),
        F.col("m")["SY"].alias("sy"),
        F.col("m")["CA"].alias("ca"),
    )


def q_src_block_records(spark, sf_dir):
    """S7 blank-line-delimited block scan (PubTator style)."""
    from belb_spark.sources.readers import read_delimited_records

    recs = read_delimited_records(spark, f"{FIXTURES}/blocks.txt", "\n\n")
    lines = recs.select(F.explode(F.split("record", "\n")).alias("line")).filter(
        F.trim("line") != ""
    )
    p = F.split("line", r"\|", 3)
    return lines.select(
        p[0].cast("long").alias("pmid"), p[1].alias("kind"), p[2].alias("text")
    )


def q_src_bioc_passages(spark, sf_dir):
    """S8 BioC scan: Spark parses the XML serialization, the oracle parses
    the JSON serialization of the SAME collection — agreement checks the
    parser. Annotations roll up to a deterministic per-passage digest."""
    from belb_spark.sources.readers import read_bioc

    p = read_bioc(spark, f"{FIXTURES}/bioc.xml", fmt="xml")
    ann_strs = F.transform(
        "annotations",
        lambda a: F.concat_ws(
            ":", a["ann_id"], a["start"], a["end"], a["text"], a["entity_type"]
        ),
    )
    return p.select(
        "doc_id",
        F.col("passage_idx").cast("long"),
        F.col("offset").cast("long"),
        "text",
        F.size("annotations").cast("long").alias("n_anns"),
        F.md5(F.concat_ws("~", F.array_sort(ann_strs))).alias("anns_digest"),
    )


def q_src_tsv_gz(spark, sf_dir):
    """S1 gzip TSV scan with explicit schema (no inference pass)."""
    from belb_spark.sources.readers import read_tsv

    return read_tsv(
        spark, f"{FIXTURES}/table.tsv.gz", schema="k long, name string, grp string"
    ).select(F.col("k").cast("long"), "name", "grp")


def q_src_rrf_pipe(spark, sf_dir):
    """S6 RRF pipe-delimited scan (UMLS MRCONSO style, trailing delimiter)."""
    from belb_spark.sources.readers import read_delimited

    df = read_delimited(
        spark, f"{FIXTURES}/rrf.txt", "|", columns=["cui", "lat", "code", "term"]
    )
    return df.select("cui", "lat", F.col("code").cast("long"), "term")


def q_src_tar_members(spark, sf_dir):
    """S3 tar-member stream: the Spark side walks members.tar.gz with the
    real reader (binaryFile + stdlib tarfile in mapInPandas); the oracle
    read_texts the pre-extracted copies of the SAME bytes — agreement
    checks the tar walk (VERDICT r3 #6)."""
    from belb_spark.sources.readers import read_tar_members

    df = read_tar_members(spark, f"{FIXTURES}/members.tar.gz", member_suffix=".txt")
    return df.select(
        F.regexp_extract("member", r"([^/]+)$", 1).alias("member"), "text"
    )


def q_snk_tsv_roundtrip(spark, sf_dir):
    """K1/K4 sink round-trip: per-lang aggregate → write_tsv(gzip) → read
    back with the S1 reader. The oracle computes the aggregate directly in
    SQL — equality proves the sink+reader preserve rows, values and types
    through the gzip TSV serialization."""
    import tempfile

    from belb_spark.sources.readers import read_tsv
    from belb_spark.sources.sinks import write_tsv

    agg = (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    out = tempfile.mkdtemp(prefix="belb_snk_tsv_")
    write_tsv(agg, out, gzip=True, header=True)
    return read_tsv(
        spark, out, schema="lang string, n_docs long, sum_chars long"
    )


def q_snk_jsonl_roundtrip(spark, sf_dir):
    """K3 sink round-trip: per-doc projection → write_jsonl → read back
    with an explicit schema; oracle computes the projection directly."""
    import tempfile

    from belb_spark.sources.sinks import write_jsonl

    proj = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "lang", F.substring("text", 1, 40).alias("head"))
    )
    out = tempfile.mkdtemp(prefix="belb_snk_jsonl_")
    write_jsonl(proj, out)
    return spark.read.schema("doc_id long, lang string, head string").json(out)


def q_stream_dedup_exact(spark, sf_dir):
    """§2.11 streaming twin, oracle-gated (VERDICT r3 #6): an availableNow
    drain of the documents table through the state-store incremental exact
    dedup, checkpointed to a scratch dir. WHICH row of a duplicate group
    survives a micro-batch is not contracted (dropDuplicates keeps an
    arbitrary one) — the DISTINCT content-hash set is, and must equal the
    batch semantics the oracle computes."""
    import os
    import tempfile

    from belb_spark.streaming.incremental import (
        incremental_exact_dedup,
        read_repo_stream,
        run_available_now,
    )

    # the file stream source ingests a DIRECTORY; testdata ships the table
    # as one parquet file — link it into a scratch ingest dir
    ingest = tempfile.mkdtemp(prefix="belb_stream_in_")
    os.symlink(
        f"{sf_dir}/documents.parquet", os.path.join(ingest, "documents.parquet")
    )
    stream = read_repo_stream(spark, ingest)
    dd = incremental_exact_dedup(stream, "text")
    ck = tempfile.mkdtemp(prefix="belb_stream_ck_")
    outp = tempfile.mkdtemp(prefix="belb_stream_out_")
    run_available_now(dd, ck, outp)
    return spark.read.parquet(outp).select("content_sha").distinct()


def q_text_unigram_freq(spark, sf_dir):
    """LM-ish quality scoring: corpus-unigram frequency score per doc
    (operators/text.unigram_freq_score) — integer sums + one exact
    division, so the oracle hash-matches bit-for-bit."""
    from belb_spark.operators.text import unigram_freq_score

    return unigram_freq_score(_docs(spark, sf_dir), "doc_id", "text").select(
        F.col("doc_id").cast("long"),
        F.col("n_tokens").cast("long"),
        F.col("sum_freq").cast("long"),
        "mean_freq",
    )


def q_text_contamination(spark, sf_dir):
    """Decontamination pass: 5-gram overlap of every doc against a
    'benchmark' slice (doc_id % 97 == 0) — the n-gram test-set-leak check a
    pretraining pipeline runs before training."""
    from belb_spark.operators.text import benchmark_contamination

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = benchmark_contamination(docs, bench, "doc_id", "text", width=5)
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("n_shingles").cast("long"),
        F.col("n_overlap").cast("long"),
        "overlap_ratio",
    )


def q_sample_stratified(spark, sf_dir):
    """Domain-mixing primitive: deterministic per-lang quota sample
    (relational.stratified_quota_sample) — seedless md5 order, capped at
    100 docs per stratum."""
    out = R.stratified_quota_sample(_docs(spark, sf_dir), "lang", "doc_id", 100)
    return out.select(
        F.col("doc_id").cast("long"), "lang", F.col("sample_rank").cast("long")
    )


def q_stream_hourly_window(spark, sf_dir):
    """§2.11 streaming twin #2, oracle-gated: availableNow drain of the
    events table through the watermarked tumbling-window aggregation
    (streaming/incremental.windowed_event_counts semantics) into a
    complete-mode memory sink — append mode would hold back windows the
    watermark has not passed, complete emits the full result, which must
    equal the batch GROUP BY the oracle computes. Sums ride DECIMAL(18,2)
    so accumulation order cannot drift the doubles."""
    import os
    import tempfile
    import uuid

    from belb_spark.streaming.incremental import read_repo_stream

    ingest = tempfile.mkdtemp(prefix="belb_stream_ev_")
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(ingest, "events.parquet"))
    stream = read_repo_stream(spark, ingest)
    events = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("sv").cast("double").alias("sum_value"),
        )
    )
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_tpch_q1(spark, sf_dir):
    return R.tpch_q1(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.col("count_order").cast("long"),
        "avg_qty",
    )


def q_star_join(spark, sf_dir):
    return R.star_join_revenue(spark, sf_dir).select(
        "r_name", F.col("n_orders").cast("long"), "revenue"
    )


def q_window_running(spark, sf_dir):
    return R.window_running_total(spark, sf_dir).select(
        F.col("o_orderkey").cast("long"), F.col("o_custkey").cast("long"), "running_total"
    )


def q_window_keepfirst(spark, sf_dir):
    return R.window_keep_first(spark, sf_dir).select(
        F.col("l_orderkey").cast("long"), F.col("first_partkey").cast("long"), "first_qty"
    )


def q_semi_anti(spark, sf_dir):
    return R.semi_anti_membership(spark, sf_dir).select(
        F.col("c_custkey").cast("long"), "has_orders"
    )


def q_history_fixpoint(spark, sf_dir):
    return R.history_fixpoint(spark, sf_dir).select(
        F.col("c_custkey").cast("long"),
        F.col("root").cast("long"),
        F.col("depth").cast("long"),
    )


def q_explode_tokens(spark, sf_dir):
    return R.explode_token_counts(spark, sf_dir).select(
        "token", F.col("cnt").cast("long")
    )


def q_synset_agg(spark, sf_dir):
    return R.synset_agg(spark, sf_dir).select(
        "source", "langs", F.col("n_docs").cast("long")
    )


def q_name_homonyms(spark, sf_dir):
    return R.name_homonyms(spark, sf_dir).select(
        "token", F.col("n_langs").cast("long"), F.col("total").cast("long")
    )


def q_json_extract(spark, sf_dir):
    return R.json_props_extract(spark, sf_dir).select(
        F.col("event_id").cast("long"), F.col("k_val").cast("long")
    )


def q_events_window(spark, sf_dir):
    return R.events_hourly_window(spark, sf_dir).select(
        "window_start", "event_type", F.col("cnt").cast("long"), "sum_value"
    )


def q_event_except(spark, sf_dir):
    return R.event_type_except(spark, sf_dir)


def q_dense_ids(spark, sf_dir):
    return R.dense_ids(spark, sf_dir).select(
        F.col("p_partkey").cast("long"), "p_brand", F.col("brand_id").cast("long")
    )


def q_min_by_shortest(spark, sf_dir):
    return R.min_by_shortest(spark, sf_dir)


def q_citations_grouping(spark, sf_dir):
    return R.citations_grouping(spark, sf_dir).select(
        F.col("user_id").cast("long"), "event_types", F.col("n_events").cast("long")
    )


def q_doc_chunking(spark, sf_dir):
    return R.doc_chunking(spark, sf_dir)


def q_group_similarity(spark, sf_dir):
    return R.group_similarity_stats(spark, sf_dir).select(
        "lang", F.col("n_pairs").cast("long"), F.col("total_ratio_ppm").cast("long")
    )


def q_events_asof_prev(spark, sf_dir):
    from belb_spark.operators.temporal import asof_prev_event

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = asof_prev_event(events, "user_id", "ts", ["value"])
    return out.select(
        F.col("event_id").cast("long"), F.col("user_id").cast("long"), "prev_value"
    )


def q_events_range_count(spark, sf_dir):
    from belb_spark.operators.temporal import range_join_count

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = range_join_count(events, "user_id", "ts", 3600)
    return out.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        F.col("n_in_range").cast("long"),
    )


def q_events_asof_signup(spark, sf_dir):
    from belb_spark.operators.temporal import asof_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("signup_value"))
    )
    out = asof_join(events, signups, "user_id", "ts", "ts", ["signup_value"])
    return out.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        F.col("asof_signup_value").alias("signup_value"),
    )


def q_kb_foreign_homonyms(spark, sf_dir):
    """A5 FOREIGN_NAME_HOMONYMS (kb.foreign_name_homonyms, reference
    belb/kbs/query.py:196-232) over a parts-derived dictionary:
    identifier=p_partkey, name=p_type, foreign key=p_brand — names used by
    >1 identifier across >1 foreign key."""
    from belb_spark.operators.kb import foreign_name_homonyms

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    kb = part.filter(F.col("p_size") <= 15).select(
        F.col("p_partkey").alias("identifier"),
        F.col("p_type").alias("name"),
        F.col("p_brand").alias("foreign_identifier"),
    )
    out = foreign_name_homonyms(kb)
    return out.select(
        "name",
        F.col("n_identifiers").cast("long"),
        F.col("n_foreign").cast("long"),
    )


def q_kb_attach_foreign(spark, sf_dir):
    """J5 cross-KB foreign join (kb.attach_foreign_names, reference
    belb/kbs/kb.py:572-661): suppliers resolve s_nationkey through a
    nation-derived foreign KB carrying preferred (description=0) and
    alias (description=1) rows; only the preferred name attaches."""
    from belb_spark.operators.kb import attach_foreign_names

    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    kb = supplier.select(
        F.col("s_suppkey").alias("identifier"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("foreign_identifier"),
    )
    foreign = nation.select(
        F.col("n_nationkey").alias("identifier"),
        F.col("n_name").alias("name"),
        F.lit(0).alias("description"),
    ).unionByName(
        nation.select(
            F.col("n_nationkey").alias("identifier"),
            F.upper("n_name").alias("name"),
            F.lit(1).alias("description"),
        )
    )
    out = attach_foreign_names(kb, foreign)
    return out.select(
        F.col("identifier").cast("long"), "name", "foreign_name"
    )


def q_split_zero_shot(spark, sf_dir):
    """A14 zero-shot slice (evaluate.zero_shot_slice, reference
    belb/scripts/get_mentions_subsets.py:82-108): test events whose
    user never appears in the train split (train = 2% of event ids),
    one broadcast-able left_anti join."""
    from belb_spark.operators.evaluate import zero_shot_slice

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    train = events.filter(F.col("event_id") % 100 < 2)
    test = events.filter(F.col("event_id") % 100 >= 2)
    out = zero_shot_slice(train, test, "user_id")
    return out.select(
        F.col("event_id").cast("long"), F.col("user_id").cast("long")
    )


def q_split_assignment(spark, sf_dir):
    """J9 splits assignment (evaluate.assign_splits, reference
    belb/corpora/parser.py:19-27 + belb/metadata/*/splits.json): a frozen
    metadata-sized splits table names the dev/test members; every
    unlisted document defaults to train via one broadcast left join."""
    from belb_spark.operators.evaluate import assign_splits

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    splits = docs.filter(F.col("doc_id") % 10 >= 7).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 7, "dev").otherwise("test").alias("split"),
    )
    out = assign_splits(docs, splits, "doc_id")
    return out.select(F.col("doc_id").cast("long"), "split")


def q_uid_dense_scalable(spark, sf_dir):
    """W1 scale path (normalize.assign_uids_scalable): dense deterministic
    1-based uid in (source, doc_id) order WITHOUT a single-partition global
    sort — literal-boundary bucketing + bucket-local windows + broadcast
    offsets. The oracle is a plain row_number(), so this row pins that the
    bucketed path equals the global sort at any partition count."""
    from belb_spark.operators.normalize import assign_uids_scalable

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    out = assign_uids_scalable(docs, keys=["source", "doc_id"])
    return out.select(
        F.col("doc_id").cast("long"), F.col("uid").cast("long")
    )


def q_pairs_within_salt(spark, sf_dir):
    """Hot-tier recall mode (pairs.candidate_pairs_salted hot_tier=
    'within_salt', VERDICT r3 #3 / r4 #6): language blocks are all hot at
    full_join_max=16, and rows_per_salt is set above every block size so
    the within-salt tier must recover EXACTLY the exhaustive within-block
    pair set — which is what the oracle computes."""
    from belb_spark.operators.pairs import PairsConfig, candidate_pairs_salted

    blocks = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("uid"), F.col("lang").alias("block_key")
    )
    out = candidate_pairs_salted(
        blocks,
        cfg=PairsConfig(full_join_max=16, anchor_rank=4),
        rows_per_salt=1_000_000,
        hot_tier="within_salt",
    )
    return out.select(
        F.col("uid_a").cast("long"), F.col("uid_b").cast("long")
    )


def q_mm_ppm_features(spark, sf_dir):
    """Multimodal image path end to end (VERDICT r4 #8): JVM-built binary
    P6 PPM payloads (multimodal.synth_ppm_col) decoded by the REAL numpy
    decoder inside the single mapInPandas stage
    (multimodal.extract_features fake_decode=False); the 4×4 grayscale
    grid feature has the closed form (doc_id*31 + k*17) % 256 that the
    oracle recomputes without decoding."""
    from belb_spark.operators.multimodal import extract_features, synth_ppm_col

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        synth_ppm_col(F.col("doc_id")).alias("payload"),
    )
    feats = extract_features(media, fake_decode=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode("feature").alias("k", "fval"),
    ).select(
        "doc_id", F.col("k").cast("long"), F.round("fval").cast("long").alias("fval")
    )


def q_mm_wav_features(spark, sf_dir):
    """Multimodal audio path end to end: JVM-built PCM16 RIFF/WAVE payloads
    (multimodal.synth_wav_col) through the REAL numpy WAV decoder; window
    values stay < 4096 so the per-window RMS is exact in float32 and
    round(rms*32768) equals the closed form ((doc_id*5 + k*9) % 100) * 40."""
    from belb_spark.operators.multimodal import extract_features, synth_wav_col

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        synth_wav_col(F.col("doc_id")).alias("payload"),
    )
    feats = extract_features(media, fake_decode=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode("feature").alias("k", "fval"),
    ).select(
        "doc_id",
        F.col("k").cast("long"),
        F.round(F.col("fval") * 32768).cast("long").alias("fval"),
    )


def q_text_repetition(spark, sf_dir):
    """Repetition-based quality filter (text.repetition_score): duplicate
    3-gram fraction per doc — all-integer until one final division."""
    from belb_spark.operators.text import repetition_score

    out = repetition_score(_docs(spark, sf_dir), "doc_id", "text", width=3)
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("n_grams").cast("long"),
        F.col("n_distinct").cast("long"),
        "dup_ratio",
    )


def q_text_pii_redact(spark, sf_dir):
    """PII scrub (text.pii_redact) over docs with one injected email and
    phone each (synthetic corpus carries none): match counts + md5 of the
    redacted text, so the oracle hash-checks the full redacted output."""
    from belb_spark.operators.text import pii_redact

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0199 now"),
        ).alias("text"),
    )
    out = pii_redact(docs, "doc_id", "text")
    return out.select(
        F.col("doc_id").cast("long"),
        "n_emails",
        "n_phones",
        F.md5("redacted").alias("redacted_md5"),
    )


def q_kb_identifier_mapping(spark, sf_dir):
    """J3/J6 identifier_mapping (kb.apply_identifier_mapping, reference
    belb/kbs/kb.py:479-537 / belb/preprocessing/data.py pmcid→pmid): map
    lineitem part references through a dense internal-id dictionary built
    over the even part keys; odd keys are observable as NULL internal ids
    (belb raises at query time — here unmapped rows pass through). One
    broadcast join, corpus side untouched."""
    from pyspark.sql import Window

    from belb_spark.operators.kb import apply_identifier_mapping

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mapping = (
        part.filter(F.col("p_partkey") % 2 == 0)
        .select(
            F.col("p_partkey").alias("original_identifier"),
            F.row_number()
            .over(Window.orderBy("p_partkey"))
            .cast("long")
            .alias("internal_identifier"),
        )
    )
    ids = lineitem.select(
        "l_orderkey", "l_linenumber", F.col("l_partkey").alias("identifier")
    )
    out = apply_identifier_mapping(ids, mapping, id_col="identifier")
    return out.select(
        F.col("l_orderkey").cast("long"),
        F.col("l_linenumber").cast("long"),
        F.col("identifier").cast("long"),
        "internal_identifier",
    )


def q_norm_patch_map(spark, sf_dir):
    """J8 manual patch map (normalize.canonicalize strategy='map' — the
    pure-JVM create_map substitution, reference belb's hand-maintained
    identifier patch dicts, belb/kbs/kb.py:251-263): customer rows carry a
    (nation-name, mktsegment) token pair; the 50-entry patch dict rewrites
    every nation alias to its canonical ``nation_<key>`` symbol while
    unpatched tokens pass through untouched."""
    from belb_spark.operators.normalize import canonicalize

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    syn = nation.select(
        F.col("n_nationkey").alias("identifier"),
        F.concat(F.lit("nation_"), F.col("n_nationkey")).alias("name"),
        F.lit(0).alias("description"),
    ).unionByName(
        nation.select(
            F.col("n_nationkey").alias("identifier"),
            F.lower("n_name").alias("name"),
            F.lit(1).alias("description"),
        )
    )
    df = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    ).select(
        "c_custkey",
        F.array(F.lower("n_name"), F.lower("c_mktsegment")).alias("tokens"),
    )
    out = canonicalize(df, syn, strategy="map")
    return out.select(
        F.col("c_custkey").cast("long"),
        F.array_join("norm_tokens", " ").alias("norm_text"),
    )


def q_pair_stats_qaqc(spark, sf_dir):
    """A10 QAQC counters (pairs.pair_stats — the no-silent-caps ledger,
    reference belb QAQC counts in belb/kbs/kb.py:680-702): per-block
    emitted vs theoretical candidate-pair counts for language blocks under
    the capped strategy (full_join_max=16, anchor_rank=4), so a reviewer
    can price exactly what the cap dropped."""
    from belb_spark.operators.pairs import PairsConfig, pair_stats

    blocks = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("uid"), F.col("lang").alias("block_key")
    )
    out = pair_stats(blocks, cfg=PairsConfig(full_join_max=16, anchor_rank=4))
    return out.select(
        "block_key",
        F.col("block_size").cast("long"),
        "pairs_theoretical",
        "pairs_emitted",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered for the driver's 50-row correctness window (VERDICT r4 #2):
    # entries with no driver-green row yet come FIRST (r4's four late
    # registrations + this round's nine new queries), then the rest,
    # longest-driver-green last — the 13 past position 50 are r1-era
    # relational trivia, all still verified every session by
    # scripts/check_oracles.py over the identical oracle SQL.
    return {
        # --- never driver-verified: r4 late registrations
        "text_unigram_freq": q_text_unigram_freq,
        "text_contamination": q_text_contamination,
        "sample_stratified": q_sample_stratified,
        "min_code_assembly": q_min_code_assembly,
        # --- new this round
        "kb_foreign_homonyms": q_kb_foreign_homonyms,
        "kb_attach_foreign": q_kb_attach_foreign,
        "split_zero_shot": q_split_zero_shot,
        "split_assignment": q_split_assignment,
        "spans_chain": q_spans_chain,
        "uid_dense_scalable": q_uid_dense_scalable,
        "pairs_within_salt": q_pairs_within_salt,
        "mm_ppm_features": q_mm_ppm_features,
        "mm_wav_features": q_mm_wav_features,
        "text_repetition": q_text_repetition,
        "text_pii_redact": q_text_pii_redact,
        "kb_identifier_mapping": q_kb_identifier_mapping,
        "norm_patch_map": q_norm_patch_map,
        "pair_stats_qaqc": q_pair_stats_qaqc,
        # --- driver-green in r4, kept inside the window
        "dedup_exact": q_exact_dedup,
        "dedup_synset_clusters": q_synset_clusters,
        "dedup_minhash_lsh_pairs": q_minhash_pairs,
        "dedup_ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "dedup_simhash": q_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "er_cc_clusters": q_cc_clusters,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_srp_buckets": q_srp_buckets,
        "ann_srp_topk": q_srp_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "text_quality": q_text_quality,
        "text_lang_id": q_lang_id,
        "text_token_counts": q_token_counts,
        "text_fingerprint": q_fingerprint,
        "history_fixpoint": q_history_fixpoint,
        "citations_grouping": q_citations_grouping,
        "doc_chunking": q_doc_chunking,
        "group_similarity_stats": q_group_similarity,
        "events_asof_prev": q_events_asof_prev,
        "events_range_count": q_events_range_count,
        "events_asof_signup": q_events_asof_signup,
        "events_overlap_join": q_events_overlap_join,
        "events_overlap_anti": q_events_overlap_anti,
        "spans_clean_iwm": q_spans_clean_iwm,
        "spans_mark": q_spans_mark,
        "spans_sentences": q_spans_sentences,
        "src_kv_records": q_src_kv_records,
        "src_block_records": q_src_block_records,
        "src_bioc_passages": q_src_bioc_passages,
        "src_tsv_gz": q_src_tsv_gz,
        "src_rrf_pipe": q_src_rrf_pipe,
        "src_tar_members": q_src_tar_members,
        "snk_tsv_roundtrip": q_snk_tsv_roundtrip,
        "snk_jsonl_roundtrip": q_snk_jsonl_roundtrip,
        "stream_dedup_exact": q_stream_dedup_exact,
        "stream_hourly_window": q_stream_hourly_window,
        # --- past the driver's 50-row window: longest-stable r1-era
        #     relational queries (still check_oracles-verified locally)
        "tpch_q1_agg": q_tpch_q1,
        "join_star_revenue": q_star_join,
        "window_running_total": q_window_running,
        "window_keep_first": q_window_keepfirst,
        "semi_anti_membership": q_semi_anti,
        "explode_token_counts": q_explode_tokens,
        "groupby_synset": q_synset_agg,
        "name_homonyms": q_name_homonyms,
        "json_props_extract": q_json_extract,
        "events_hourly_window": q_events_window,
        "event_type_except": q_event_except,
        "dense_ids": q_dense_ids,
        "min_by_shortest": q_min_by_shortest,
    }


# ------------------------------------------------------------ oracle SQL

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _sh_cte(width: int) -> str:
    """CTE fragment: per-doc distinct token shingles of given width.
    Short-doc semantics match shingles_col: 0 < n < width emits one
    whole-text shingle; empty docs emit none."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(width))
    return f"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {parts} AS s
  FROM toks, (SELECT unnest(range(1, 2000)) AS i) ix
  WHERE i <= len(t) - {width - 1}
  UNION
  SELECT doc_id, array_to_string(t, ' ') AS s
  FROM toks WHERE len(t) > 0 AND len(t) < {width}
)"""


def _minhash_sql() -> str:
    sig_cols = ",\n    ".join(
        f"min(md5('{p}:' || s)) AS sig{p}" for p in range(MINHASH_PERMS)
    )
    band_exprs = []
    for b in range(MINHASH_PERMS // MINHASH_BAND):
        parts = " || '_' || ".join(
            f"sig{b * MINHASH_BAND + r}" for r in range(MINHASH_BAND)
        )
        band_exprs.append(f"SELECT doc_id, '{b}' || '_' || {parts} AS band_key FROM sigs")
    bands = "\nUNION ALL\n".join(band_exprs)
    return f"""
WITH {_sh_cte(3)},
sigs AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
shl AS (SELECT doc_id, list(DISTINCT s) AS sl FROM sh GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
j AS (
  SELECT id_a, id_b,
         len(list_intersect(x.sl, y.sl))::DOUBLE /
         (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))) AS jc
  FROM cand JOIN shl x ON cand.id_a = x.doc_id JOIN shl y ON cand.id_b = y.doc_id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, round(jc, 4) AS jaccard
FROM j WHERE jc >= 0.2
"""


def _ngram_sql() -> str:
    return f"""
WITH {_sh_cte(NGRAM_W)},
shl AS (SELECT doc_id, list(DISTINCT s) AS sl FROM sh GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
),
j AS (
  SELECT id_a, id_b,
         len(list_intersect(x.sl, y.sl))::DOUBLE /
         (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))) AS jc
  FROM cand JOIN shl x ON cand.id_a = x.doc_id JOIN shl y ON cand.id_b = y.doc_id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, round(jc, 4) AS jaccard
FROM j WHERE jc >= 0.3
"""


def _cc_sql() -> str:
    """Connected components oracle: recursive min-label reachability over the
    ngram-jaccard edge set (same edges as er_cc_clusters)."""
    return f"""
WITH RECURSIVE {_sh_cte(NGRAM_W)},
shl AS (SELECT doc_id, list(DISTINCT s) AS sl FROM sh GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           len(list_intersect(x.sl, y.sl))::DOUBLE /
           (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))) AS jc
    FROM cand JOIN shl x ON cand.id_a = x.doc_id JOIN shl y ON cand.id_b = y.doc_id
  ) WHERE jc >= 0.3
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM edges
  UNION SELECT id_b, id_a FROM edges
),
reach(u, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.u, r.lbl FROM sym s JOIN reach r ON s.v = r.u
)
SELECT u::BIGINT AS doc_id, min(lbl)::BIGINT AS cluster FROM reach GROUP BY u
"""


def _simhash_sql() -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN substr(h, {b + 1}, 1) IN {HIGH} THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    bits = " + ".join(f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents
),
hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
sums AS (SELECT doc_id, {sums} FROM hs GROUP BY doc_id)
SELECT doc_id::BIGINT AS doc_id, ({bits})::BIGINT AS simhash FROM sums
"""


def _srp_bucket_expr(table: int = 0) -> str:
    ws = srp_weights(8, 64, table)
    terms = []
    for p, w in enumerate(ws):
        arr = "[" + ", ".join(str(x) for x in w) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), {arr}) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _srp_sql() -> str:
    return (
        f"SELECT vec_id::BIGINT AS vec_id, ({_srp_bucket_expr()})::BIGINT AS bucket "
        "FROM embeddings"
    )


def _srp_topk_sql() -> str:
    """SRP-ANN oracle: bucket both sides with the same hyperplanes, join on
    bucket, exact-cosine re-rank within the bucket."""
    return f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         ({_srp_bucket_expr()}) AS bucket
  FROM embeddings
),
c AS (SELECT * FROM b WHERE vec_id >= 10),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
s AS (
  SELECT query_id, c.vec_id,
         round(list_inner_product(v, qv) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))), 3) AS cosine
  FROM c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM s
)
SELECT query_id::BIGINT AS query_id, vec_id::BIGINT AS vec_id,
       rank::BIGINT AS rank, cosine
FROM r WHERE rank <= 5
"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["dedup_exact"] = """
WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents)
SELECT doc_id::BIGINT AS doc_id,
       min(doc_id) OVER (PARTITION BY hh)::BIGINT AS rep_id,
       count(*) OVER (PARTITION BY hh)::BIGINT AS group_size
FROM h
"""

    sql["dedup_synset_clusters"] = f"""
WITH k AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({_TOKS})), '')) AS sk
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       min(doc_id) OVER (PARTITION BY sk)::BIGINT AS cluster
FROM k
"""

    sql["dedup_minhash_lsh_pairs"] = _minhash_sql()
    sql["dedup_ngram_jaccard_pairs"] = _ngram_sql()
    sql["dedup_simhash"] = _simhash_sql()
    sql["er_cc_clusters"] = _cc_sql()

    sql["ann_cosine_topk"] = """
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id >= 10),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT query_id, vec_id,
         round(list_inner_product(v, qv) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))), 3) AS cosine
  FROM c, q WHERE vec_id <> query_id
),
r AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM s
)
SELECT query_id::BIGINT AS query_id, vec_id::BIGINT AS vec_id,
       rank::BIGINT AS rank, cosine
FROM r WHERE rank <= 5
"""

    sql["ann_srp_buckets"] = _srp_sql()
    sql["ann_srp_topk"] = _srp_topk_sql()

    _COS6 = (
        "round(list_inner_product({a}, {b}) / "
        "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))), 6)"
    )
    _COS3 = (
        "round(list_inner_product({a}, {b}) / "
        "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))), 3)"
    )
    sql["ann_ivf_topk"] = f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings WHERE vec_id >= 10),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 10),
cent AS (SELECT vec_id AS cid, v AS cv FROM c ORDER BY vec_id LIMIT 8),
ca AS (SELECT vec_id, cid, {_COS6.format(a="v", b="cv")} AS cc FROM c, cent),
cellof AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
    FROM ca) WHERE rn = 1
),
qa AS (SELECT query_id, cid, {_COS6.format(a="qv", b="cv")} AS cc FROM q, cent),
probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT query_id, cid, row_number() OVER (PARTITION BY query_id ORDER BY cc DESC, cid ASC) AS rn
    FROM qa) WHERE rn <= 2
),
s AS (
  SELECT p.query_id, co.vec_id, {_COS3.format(a="c.v", b="q.qv")} AS cosine
  FROM probes p
  JOIN cellof co ON co.cell = p.cell
  JOIN c ON c.vec_id = co.vec_id
  JOIN q ON q.query_id = p.query_id
  WHERE co.vec_id <> p.query_id
),
r AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM s
)
SELECT query_id::BIGINT AS query_id, vec_id::BIGINT AS vec_id,
       rank::BIGINT AS rank, cosine
FROM r WHERE rank <= 5
"""

    # two unioned SRP plane sets (LSH band tables): candidates share a
    # bucket in EITHER table, deduped, then exact-cosine verified
    sql["dedup_embedding_cosine"] = f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         ({_srp_bucket_expr(0)}) AS bucket0,
         ({_srp_bucket_expr(1)}) AS bucket1
  FROM embeddings
),
c AS (
  SELECT a.vec_id AS id_a, x.vec_id AS id_b,
         round(list_inner_product(a.v, x.v) /
               (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(x.v, x.v))), 3) AS cosine
  FROM b a JOIN b x
    ON (a.bucket0 = x.bucket0 OR a.bucket1 = x.bucket1) AND a.vec_id < x.vec_id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, cosine
FROM c WHERE cosine >= 0.2
"""

    sql["text_quality"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk, text FROM documents)
SELECT doc_id::BIGINT AS doc_id,
       len(tk)::BIGINT AS n_tokens,
       round(list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk), 4) AS avg_token_len,
       round(len(list_filter(tk, x -> x IN ('the','a')))::DOUBLE / len(tk), 4) AS stopword_ratio,
       round(len(list_filter(tk, x -> len(x) <= 3))::DOUBLE / len(tk), 4) AS short_ratio
FROM t
"""

    sql["text_lang_id"] = f"""
WITH t AS (SELECT doc_id, lang, {_TOKS} AS tk FROM documents),
p AS (
  SELECT doc_id, lang,
         CASE WHEN len(list_filter(tk, x -> x IN ('the','a')))::DOUBLE / len(tk) >= 0.05
              THEN 'en' ELSE 'other' END AS pred_lang
  FROM t
)
SELECT doc_id::BIGINT AS doc_id, pred_lang, (pred_lang = lang) AS matches FROM p
"""

    sql["text_token_counts"] = f"""
SELECT doc_id::BIGINT AS doc_id,
       len({_TOKS})::BIGINT AS n_tokens,
       ceil(len(text) / 4.0)::BIGINT AS est_bpe
FROM documents
"""

    sql["text_fingerprint"] = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
  FROM toks, (SELECT unnest(range(1, 2000)) AS i) ix
  WHERE i <= len(t) - 3
  UNION
  SELECT doc_id, array_to_string(t, ' ') AS s
  FROM toks WHERE len(t) > 0 AND len(t) < 4
)
SELECT doc_id::BIGINT AS doc_id, min(md5(s)) AS fingerprint FROM sh GROUP BY doc_id
"""

    sql["tpch_q1_agg"] = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  count(*)::BIGINT AS count_order,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    sql["join_star_revenue"] = """
SELECT r_name, count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

    sql["window_running_total"] = """
SELECT o_orderkey::BIGINT AS o_orderkey, o_custkey::BIGINT AS o_custkey,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""

    sql["window_keep_first"] = """
WITH r AS (
  SELECT l_orderkey, l_partkey, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
  FROM lineitem
)
SELECT l_orderkey::BIGINT AS l_orderkey, l_partkey::BIGINT AS first_partkey,
       CAST(l_quantity AS DOUBLE) AS first_qty
FROM r WHERE rn = 1
"""

    sql["semi_anti_membership"] = """
SELECT c_custkey::BIGINT AS c_custkey,
       (o_custkey IS NOT NULL) AS has_orders
FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
  ON c_custkey = o_custkey
"""

    sql["history_fixpoint"] = """
WITH RECURSIVE walk(k, cur, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT k, cur // 7, depth + 1 FROM walk WHERE cur // 7 >= 1
),
final AS (
  SELECT k, cur, depth,
         row_number() OVER (PARTITION BY k ORDER BY depth DESC) AS rn
  FROM walk
)
SELECT k::BIGINT AS c_custkey, cur::BIGINT AS root, depth::BIGINT AS depth
FROM final WHERE rn = 1
"""

    sql["explode_token_counts"] = f"""
SELECT t.token, count(*)::BIGINT AS cnt
FROM (SELECT unnest({_TOKS}) AS token FROM documents) t
GROUP BY t.token
"""

    sql["groupby_synset"] = """
SELECT source,
       array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY source
"""

    sql["name_homonyms"] = f"""
WITH t AS (SELECT lang, unnest({_TOKS}) AS token FROM documents)
SELECT token, count(DISTINCT lang)::BIGINT AS n_langs, count(*)::BIGINT AS total
FROM t GROUP BY token HAVING count(DISTINCT lang) > 1
"""

    sql["json_props_extract"] = """
SELECT event_id::BIGINT AS event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
"""

    sql["events_hourly_window"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

    sql["event_type_except"] = """
SELECT event_type, floor(value)::BIGINT AS value_bucket
FROM events WHERE ts < TIMESTAMP '2024-01-03'
EXCEPT
SELECT event_type, floor(value)::BIGINT
FROM events WHERE ts >= TIMESTAMP '2024-01-03'
"""

    sql["dense_ids"] = """
SELECT p_partkey::BIGINT AS p_partkey, p_brand,
       dense_rank() OVER (ORDER BY p_brand)::BIGINT AS brand_id
FROM part
"""

    sql["min_by_shortest"] = """
WITH r AS (
  SELECT p_brand, p_name,
         row_number() OVER (PARTITION BY p_brand ORDER BY len(p_name), p_name) AS rn
  FROM part
)
SELECT p_brand, p_name AS shortest_name FROM r WHERE rn = 1
"""

    sql["citations_grouping"] = """
SELECT user_id::BIGINT AS user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
       count(*)::BIGINT AS n_events
FROM events GROUP BY user_id
"""

    sql["doc_chunking"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
c AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(tk[(i*20+1):(i*20+20)], ' ') AS chunk_text
  FROM t, (SELECT unnest(range(0, 1000)) AS i) ix
  WHERE i < ceil(len(tk) / 20.0)
)
SELECT doc_id::BIGINT AS doc_id, chunk_idx::BIGINT AS chunk_idx, chunk_text FROM c
"""

    # indel-normalized ratio in ppm (Levenshtein.ratio semantics, reference
    # stats.py:203-216): identical double per pair both engines, exact
    # BIGINT sum — no float-accumulation drift
    sql["group_similarity_stats"] = """
WITH top AS (
  SELECT lang, doc_id, substr(text, 1, 60) AS t,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn
  FROM documents
)
SELECT a.lang, count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN len(a.t) + len(b.t) = 0 THEN 1000000
            ELSE round(1000000.0 * (1 - levenshtein(a.t, b.t)::DOUBLE /
                                        (len(a.t) + len(b.t))))::BIGINT
       END)::BIGINT AS total_ratio_ppm
FROM top a JOIN top b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE a.rn <= 8 AND b.rn <= 8
GROUP BY a.lang
"""

    sql["events_asof_prev"] = """
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, value) AS prev_value
FROM events
"""

    sql["events_range_count"] = """
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)::BIGINT AS n_in_range
FROM events
"""

    sql["events_overlap_join"] = """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         floor(epoch(ts))::BIGINT AS c_start, floor(epoch(ts))::BIGINT + 600 AS c_end
  FROM events WHERE event_type = 'click'
),
s AS (
  SELECT event_id AS signup_id, user_id,
         floor(epoch(ts))::BIGINT AS s_start, floor(epoch(ts))::BIGINT + 3600 AS s_end
  FROM events WHERE event_type = 'signup'
)
SELECT c.click_id::BIGINT AS click_id, s.signup_id::BIGINT AS signup_id,
       (least(c.c_end, s.s_end) - greatest(c.c_start, s.s_start))::BIGINT AS overlap_sec
FROM c JOIN s ON c.user_id = s.user_id
               AND c.c_start < s.s_end AND s.s_start < c.c_end
"""

    sql["events_overlap_anti"] = """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         floor(epoch(ts))::BIGINT AS c_start, floor(epoch(ts))::BIGINT + 600 AS c_end
  FROM events WHERE event_type = 'click'
),
s AS (
  SELECT user_id,
         floor(epoch(ts))::BIGINT AS s_start, floor(epoch(ts))::BIGINT + 3600 AS s_end
  FROM events WHERE event_type = 'signup'
)
SELECT c.click_id::BIGINT AS click_id, c.user_id::BIGINT AS user_id
FROM c WHERE NOT EXISTS (
  SELECT 1 FROM s WHERE s.user_id = c.user_id
    AND c.c_start < s.s_end AND s.s_start < c.c_end
)
"""

    # T1/T3 twins: the rewrite is pure offset arithmetic for the fixed
    # derived spans [5,12) and [20,28), so the oracle reconstructs the
    # transformed text by concatenation and the offsets by conditional shifts
    _ALNUM = "'^[a-zA-Z0-9]$'"
    sql["spans_clean_iwm"] = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE n_chars >= 28),
c AS (
  SELECT doc_id, text,
    CASE WHEN regexp_matches(substr(text, 5, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c1,
    CASE WHEN regexp_matches(substr(text, 13, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c2,
    CASE WHEN regexp_matches(substr(text, 20, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c3,
    CASE WHEN regexp_matches(substr(text, 29, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c4
  FROM d
),
n AS (
  SELECT doc_id, c1, c2, c3,
    md5(substr(text, 1, 5) || (CASE WHEN c1 = 1 THEN ' ' ELSE '' END)
        || substr(text, 6, 7) || (CASE WHEN c2 = 1 THEN ' ' ELSE '' END)
        || substr(text, 13, 8) || (CASE WHEN c3 = 1 THEN ' ' ELSE '' END)
        || substr(text, 21, 8) || (CASE WHEN c4 = 1 THEN ' ' ELSE '' END)
        || substr(text, 29)) AS text_md5,
    substr(text, 6, 7) AS t0, substr(text, 21, 8) AS t1
  FROM c
)
SELECT doc_id::BIGINT AS doc_id, 0::BIGINT AS span_id,
       (5 + c1)::BIGINT AS start, (12 + c1)::BIGINT AS "end",
       t0 AS span_text, text_md5
FROM n
UNION ALL
SELECT doc_id::BIGINT, 1::BIGINT,
       (20 + c1 + c2 + c3)::BIGINT, (28 + c1 + c2 + c3)::BIGINT,
       t1, text_md5
FROM n
"""

    # T4 twin: the T1 rewrite and the T3 rewrite composed in one concat —
    # markers land inside the cleaned text at the T1-shifted offsets, and
    # the final offsets add the marker widths (5 per '[MS] ', 5 per ' [ME]')
    sql["spans_chain"] = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE n_chars >= 28),
c AS (
  SELECT doc_id, text,
    CASE WHEN regexp_matches(substr(text, 5, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c1,
    CASE WHEN regexp_matches(substr(text, 13, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c2,
    CASE WHEN regexp_matches(substr(text, 20, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c3,
    CASE WHEN regexp_matches(substr(text, 29, 1), {_ALNUM}) THEN 1 ELSE 0 END AS c4
  FROM d
),
n AS (
  SELECT doc_id, c1, c2, c3,
    md5(substr(text, 1, 5) || (CASE WHEN c1 = 1 THEN ' ' ELSE '' END)
        || '[MS] ' || substr(text, 6, 7) || ' [ME]'
        || (CASE WHEN c2 = 1 THEN ' ' ELSE '' END)
        || substr(text, 13, 8) || (CASE WHEN c3 = 1 THEN ' ' ELSE '' END)
        || '[MS] ' || substr(text, 21, 8) || ' [ME]'
        || (CASE WHEN c4 = 1 THEN ' ' ELSE '' END)
        || substr(text, 29)) AS text_md5,
    substr(text, 6, 7) AS t0, substr(text, 21, 8) AS t1
  FROM c
)
SELECT doc_id::BIGINT AS doc_id, 0::BIGINT AS span_id,
       (10 + c1)::BIGINT AS start, (17 + c1)::BIGINT AS "end",
       t0 AS span_text, text_md5
FROM n
UNION ALL
SELECT doc_id::BIGINT, 1::BIGINT,
       (35 + c1 + c2 + c3)::BIGINT, (43 + c1 + c2 + c3)::BIGINT,
       t1, text_md5
FROM n
"""

    sql["spans_mark"] = """
WITH d AS (SELECT doc_id, text FROM documents WHERE n_chars >= 28),
n AS (
  SELECT doc_id,
    md5(substr(text, 1, 5) || '[MS] ' || substr(text, 6, 7) || ' [ME]'
        || substr(text, 13, 8) || '[MS] ' || substr(text, 21, 8) || ' [ME]'
        || substr(text, 29)) AS text_md5,
    substr(text, 6, 7) AS t0, substr(text, 21, 8) AS t1
  FROM d
)
SELECT doc_id::BIGINT AS doc_id, 0::BIGINT AS span_id,
       10::BIGINT AS start, 17::BIGINT AS "end", t0 AS span_text, text_md5
FROM n
UNION ALL
SELECT doc_id::BIGINT, 1::BIGINT, 35::BIGINT, 43::BIGINT, t1, text_md5
FROM n
"""

    # T2 oracle: generic re-implementation of the sentence boundary rule —
    # candidate cut at '[.!?][closer?] ' or a CJK terminator, suppressed
    # inside spans [40,50)/[5,9), by a lowercase/digit continuation, or (for
    # a bare '.') by a known abbreviation / single-letter token. The IN-list
    # is generated from spans.ABBREVIATIONS so the two rules cannot drift.
    # Sentences reassembled with window lead() + space-trim arithmetic.
    from belb_spark.operators.spans import ABBREVIATIONS

    _abbrevs = ",".join(f"'{a}'" for a in sorted(ABBREVIATIONS))
    _closers = "'\"','''','”','’',')',']'"
    sql["spans_sentences"] = f"""
WITH d AS (
  SELECT doc_id,
         'Dr. Who saw ' || substr(text, 1, 30) || '. Then vs. 3. 14 rose! '
         || substr(text, 31, 40)
         || '? End here. U.S. Navy said "Stop." 文。次 came. Yes.' AS text
  FROM documents WHERE n_chars >= 48
),
pos AS (
  SELECT doc_id, text, i AS p
  FROM d, (SELECT unnest(range(1, 250)) AS i) ix
  WHERE i < len(text)
),
-- ASCII terminators: cut lands after the optional single closing
-- quote/paren; suppressions check the char after the following space
cand_ascii AS (
  SELECT doc_id, text,
         CASE WHEN substr(text, p + 1, 1) IN ({_closers}) THEN p + 1 ELSE p END AS c,
         p,
         CASE WHEN substr(text, p + 1, 1) IN ({_closers}) THEN 1 ELSE 0 END AS closers
  FROM pos
  WHERE substr(text, p, 1) IN ('.', '!', '?')
    AND (substr(text, p + 1, 1) = ' '
         OR (substr(text, p + 1, 1) IN ({_closers})
             AND substr(text, p + 2, 1) = ' '))
),
cand AS (
  SELECT doc_id, text, c
  FROM cand_ascii
  WHERE NOT (c > 40 AND c < 50)
    AND NOT (c > 5 AND c < 9)
    AND NOT regexp_matches(substr(text, c + 2, 1), '^[a-z0-9]$')
    AND NOT (substr(text, p, 1) = '.' AND closers = 0
             AND (lower(regexp_extract(substr(text, 1, p - 1), '([A-Za-z]+)$', 1))
                    IN ({_abbrevs})
                  OR regexp_matches(substr(text, 1, p - 1), '(^|[^A-Za-z])[A-Za-z]$')))
  UNION ALL
  -- CJK terminators: cut right after the character, no space required,
  -- span suppression only
  SELECT doc_id, text, p AS c
  FROM pos
  WHERE substr(text, p, 1) IN ('。', '！', '？')
    AND NOT (p > 40 AND p < 50)
    AND NOT (p > 5 AND p < 9)
),
bnds AS (
  SELECT doc_id, text, 0 AS c FROM d
  UNION ALL SELECT doc_id, text, len(text) FROM d
  UNION ALL SELECT doc_id, text, c FROM cand
),
seg AS (
  SELECT doc_id, text, c AS a,
         lead(c) OVER (PARTITION BY doc_id ORDER BY c) AS b
  FROM bnds
),
s2 AS (
  SELECT doc_id, a, substr(text, a + 1, b - a) AS seg
  FROM seg WHERE b IS NOT NULL
),
s3 AS (
  SELECT doc_id, a,
         trim(seg, ' ') AS stripped,
         len(seg) - len(ltrim(seg, ' ')) AS lead_n
  FROM s2 WHERE trim(seg, ' ') <> ''
)
SELECT doc_id::BIGINT AS doc_id,
       (row_number() OVER (PARTITION BY doc_id ORDER BY a) - 1)::BIGINT AS sent_id,
       (a + lead_n)::BIGINT AS sent_start,
       (a + lead_n + len(stripped))::BIGINT AS sent_end,
       stripped AS sent_text
FROM s3
"""

    sql["min_code_assembly"] = """
WITH d AS (
  SELECT user_id AS identifier, event_type AS name,
         floor(value)::BIGINT AS description
  FROM events
),
per_name AS (
  SELECT identifier, name, min(description) AS description
  FROM d GROUP BY identifier, name
),
flagged AS (
  SELECT identifier, name, description,
         max(CASE WHEN description = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY identifier) AS has_symbol,
         min(name) OVER (PARTITION BY identifier) AS min_name
  FROM per_name
)
SELECT identifier::BIGINT AS identifier, name,
       (CASE WHEN has_symbol = 0 AND name = min_name THEN 0
             ELSE description END)::BIGINT AS description
FROM flagged
"""

    # --- source-format twins (fixture files, absolute repo paths) ---
    sql["src_kv_records"] = f"""
WITH raw AS (SELECT content FROM read_text('{FIXTURES}/records.txt')),
rec AS (SELECT unnest(string_split(content, '\n//\n')) AS r FROM raw),
rec2 AS (SELECT r FROM rec WHERE trim(r) <> ''),
lines AS (SELECT r, unnest(string_split(r, chr(10))) AS line FROM rec2),
kv AS (
  SELECT r, regexp_extract(line, '^(\\S+)', 1) AS k,
         trim(regexp_replace(line, '^\\S+\\s*', '')) AS v
  FROM lines WHERE trim(line) <> ''
)
SELECT max(CASE WHEN k = 'ID' THEN v END) AS name,
       max(CASE WHEN k = 'AC' THEN v END) AS ac,
       max(CASE WHEN k = 'SY' THEN v END) AS sy,
       max(CASE WHEN k = 'CA' THEN v END) AS ca
FROM kv GROUP BY r
"""

    sql["src_block_records"] = f"""
WITH raw AS (SELECT content FROM read_text('{FIXTURES}/blocks.txt')),
blk AS (SELECT unnest(string_split(content, chr(10) || chr(10))) AS b FROM raw),
lines AS (
  SELECT unnest(string_split(b, chr(10))) AS line
  FROM blk WHERE trim(b) <> ''
),
p AS (SELECT string_split(line, '|') AS l FROM lines WHERE trim(line) <> '')
SELECT l[1]::BIGINT AS pmid, l[2] AS kind, l[3] AS text FROM p
"""

    sql["src_bioc_passages"] = f"""
WITH c AS (
  SELECT unnest(documents) AS doc FROM read_json('{FIXTURES}/bioc.json')
),
p AS (
  SELECT doc.id AS doc_id, i - 1 AS passage_idx, doc.passages[i] AS ps
  FROM c, (SELECT unnest(range(1, 50)) AS i) ix
  WHERE i <= len(doc.passages)
)
SELECT doc_id, passage_idx::BIGINT AS passage_idx,
       (ps.offset)::BIGINT AS offset, ps.text AS text,
       coalesce(len(ps.annotations), 0)::BIGINT AS n_anns,
       md5(coalesce(array_to_string(list_sort(list_transform(ps.annotations,
           a -> a.id || ':' || (a.locations[1].offset)::BIGINT::VARCHAR || ':'
             || ((a.locations[1].offset) + (a.locations[1].length))::BIGINT::VARCHAR
             || ':' || a.text || ':' || a.infons."type")), '~'), '')) AS anns_digest
FROM p
"""

    sql["src_tsv_gz"] = f"""
SELECT k::BIGINT AS k, name, grp
FROM read_csv('{FIXTURES}/table.tsv.gz', delim='\t', header=true)
"""

    sql["src_rrf_pipe"] = f"""
SELECT column0 AS cui, column1 AS lat, column2::BIGINT AS code, column3 AS term
FROM read_csv('{FIXTURES}/rrf.txt', delim='|', header=false)
"""

    # S3: the oracle reads the pre-extracted copies of the tarred bytes
    sql["src_tar_members"] = f"""
SELECT regexp_extract(filename, '([^/]+)$', 1) AS member, content AS text
FROM read_text('{FIXTURES}/tar_members/*.txt')
"""

    # K1/K4 round-trip: the oracle computes the aggregate the Spark side
    # wrote to gzip TSV and read back
    sql["snk_tsv_roundtrip"] = """
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY lang
"""

    sql["snk_jsonl_roundtrip"] = """
SELECT doc_id::BIGINT AS doc_id, lang, substr(text, 1, 40) AS head
FROM documents WHERE doc_id < 200
"""

    # §2.11 streaming twin: the distinct content-hash set after an
    # availableNow incremental dedup drain == batch DISTINCT semantics
    sql["stream_dedup_exact"] = """
SELECT DISTINCT sha256(text) AS content_sha FROM documents
"""

    sql["text_unigram_freq"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
counts AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok)
SELECT t.doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_tokens,
       sum(c.freq)::BIGINT AS sum_freq,
       round(sum(c.freq)::DOUBLE / count(*), 4) AS mean_freq
FROM toks t JOIN counts c USING (tok)
GROUP BY t.doc_id
"""

    sql["text_contamination"] = f"""
WITH {_sh_cte(5)},
b AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
hit AS (
  SELECT doc_id, count(*) AS n_overlap FROM sh
  WHERE s IN (SELECT s FROM b) GROUP BY doc_id
)
SELECT tot.doc_id::BIGINT AS doc_id, tot.n_shingles::BIGINT AS n_shingles,
       COALESCE(hit.n_overlap, 0)::BIGINT AS n_overlap,
       round(COALESCE(hit.n_overlap, 0)::DOUBLE / tot.n_shingles, 4) AS overlap_ratio
FROM tot LEFT JOIN hit USING (doc_id)
"""

    sql["sample_stratified"] = """
SELECT doc_id::BIGINT AS doc_id, lang, rn::BIGINT AS sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents)
WHERE rn <= 100
"""

    sql["stream_hourly_window"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

    sql["events_asof_signup"] = """
WITH signups AS (
  SELECT user_id, ts, max(value) AS signup_value
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
)
SELECT e.event_id::BIGINT AS event_id, e.user_id::BIGINT AS user_id,
       s.signup_value
FROM events e ASOF LEFT JOIN signups s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""

    sql["kb_foreign_homonyms"] = """
SELECT p_type AS name,
       count(DISTINCT p_partkey)::BIGINT AS n_identifiers,
       count(DISTINCT p_brand)::BIGINT AS n_foreign
FROM part WHERE p_size <= 15
GROUP BY p_type
HAVING count(DISTINCT p_partkey) > 1 AND count(DISTINCT p_brand) > 1
"""

    sql["kb_attach_foreign"] = """
SELECT s.s_suppkey::BIGINT AS identifier, s.s_name AS name,
       n.n_name AS foreign_name
FROM supplier s LEFT JOIN nation n
  ON CAST(s.s_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
"""

    sql["split_zero_shot"] = """
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id
FROM events e
WHERE event_id % 100 >= 2
  AND NOT EXISTS (
    SELECT 1 FROM events t
    WHERE t.event_id % 100 < 2 AND t.user_id = e.user_id
  )
"""

    sql["split_assignment"] = """
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(CASE WHEN s.doc_id % 10 = 7 THEN 'dev'
                     WHEN s.doc_id IS NOT NULL THEN 'test' END,
                'train') AS split
FROM documents d LEFT JOIN documents s
  ON d.doc_id = s.doc_id AND s.doc_id % 10 >= 7
"""

    sql["uid_dense_scalable"] = """
SELECT doc_id::BIGINT AS doc_id,
       row_number() OVER (ORDER BY source, doc_id)::BIGINT AS uid
FROM documents
"""

    sql["pairs_within_salt"] = """
SELECT DISTINCT a.doc_id::BIGINT AS uid_a, b.doc_id::BIGINT AS uid_b
FROM documents a JOIN documents b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
"""

    sql["mm_ppm_features"] = """
SELECT doc_id::BIGINT AS doc_id, k::BIGINT AS k,
       ((doc_id * 31 + k * 17) % 256)::BIGINT AS fval
FROM documents, (SELECT unnest(range(16)) AS k) ks
"""

    sql["mm_wav_features"] = """
SELECT doc_id::BIGINT AS doc_id, k::BIGINT AS k,
       (((doc_id * 5 + k * 9) % 100) * 40)::BIGINT AS fval
FROM documents, (SELECT unnest(range(16)) AS k) ks
"""

    sql[
        "text_repetition"
    ] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
g AS (
  SELECT doc_id,
         len(t) - 2 AS n_grams,
         len(list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS n_distinct
  FROM toks WHERE len(t) >= 3
)
SELECT doc_id::BIGINT AS doc_id, n_grams::BIGINT AS n_grams,
       n_distinct::BIGINT AS n_distinct,
       round((n_grams - n_distinct)::DOUBLE / n_grams, 4) AS dup_ratio
FROM g
"""

    sql["text_pii_redact"] = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or +1-555-0199 now'
           AS text
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
         AS n_emails,
       len(regexp_extract_all(text, '\+1-[0-9]{3}-[0-9]{4}'))::BIGINT
         AS n_phones,
       md5(regexp_replace(
           regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
           '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
FROM d
"""

    sql["kb_identifier_mapping"] = """
WITH m AS (
  SELECT p_partkey AS orig,
         row_number() OVER (ORDER BY p_partkey)::BIGINT AS internal
  FROM part WHERE p_partkey % 2 = 0
)
SELECT l.l_orderkey::BIGINT AS l_orderkey,
       l.l_linenumber::BIGINT AS l_linenumber,
       l.l_partkey::BIGINT AS identifier,
       m.internal AS internal_identifier
FROM lineitem l LEFT JOIN m ON l.l_partkey = m.orig
"""

    sql["norm_patch_map"] = """
SELECT c.c_custkey::BIGINT AS c_custkey,
       'nation_' || n.n_nationkey || ' ' || lower(c.c_mktsegment) AS norm_text
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
"""

    sql["pair_stats_qaqc"] = """
SELECT lang AS block_key,
       count(*)::BIGINT AS block_size,
       (count(*) * (count(*) - 1) / 2)::BIGINT AS pairs_theoretical,
       CASE WHEN count(*) <= 16
            THEN count(*) * (count(*) - 1) / 2
            ELSE 4 * (count(*) - 1) - 6
       END::BIGINT AS pairs_emitted
FROM documents GROUP BY lang
"""

    return sql


# ---------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: near-duplicate document clusters — MinHash-LSH
    blocking → Jaccard scoring → large-star/small-star clustering, the same
    skeleton as the full ER pipeline (belb_spark.pipeline)."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir)
    edges = minhash_lsh_pairs(docs, "doc_id", "text", 8, 2, 3, 0.2).select(
        F.col("id_a").alias("uid_a"), F.col("id_b").alias("uid_b")
    )
    assign = connected_components(edges, docs.select(F.col("doc_id").alias("uid")))
    return (
        assign.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("size"), F.min("uid").alias("rep"))
        .orderBy(F.col("size").desc(), F.col("cluster"))
    )

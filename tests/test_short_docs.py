"""Short/empty-document regression tests (ADVICE r1, high).

Spark 4 runs with ANSI on: the old element_at-based shingle builder threw
INVALID_ARRAY_INDEX_IN_ELEMENT_AT on any doc with fewer tokens than the
shingle width, and doc_chunking emitted bogus rows for zero-token docs.
These tests pin the fixed semantics AND oracle parity (DuckDB twin) on a
corpus that actually contains short and empty docs.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from belb_spark.operators.blocking import shingles_col
from belb_spark.operators.dedup import tokens_col
from belb_spark.operators.text import doc_fingerprint

SHORT_DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "",                      # zero tokens
            "ab",                    # 1 token  (< width)
            "a b",                   # 2 tokens (< width 3 and 4)
            "a b c d e f g",         # normal
            "a b c d e f g",         # exact dup of 4
            "x",                     # 1 token, another short doc
        ],
        "source": ["s"] * 6,
        "lang": ["en"] * 6,
        "n_chars": [0, 2, 3, 13, 13, 1],
    }
)


@pytest.fixture(scope="module")
def short_dir(spark):
    d = tempfile.mkdtemp(prefix="belb_shortdocs_")
    SHORT_DOCS.to_parquet(f"{d}/documents.parquet", index=False)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_shingles_col_short_and_empty(spark):
    df = spark.createDataFrame(SHORT_DOCS[["doc_id", "text"]])
    out = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select(
            "doc_id", shingles_col(tokens_col("text"), 3).alias("sh")
        ).collect()
    }
    assert out[1] == []                      # empty doc -> no shingles
    assert out[2] == ["ab"]                  # whole-text shingle
    assert out[3] == ["a b"]
    assert out[4] == ["a b c", "b c d", "c d e", "d e f", "e f g"]


def test_doc_fingerprint_short_docs(spark):
    df = spark.createDataFrame(SHORT_DOCS[["doc_id", "text"]])
    rows = {r["doc_id"]: r["fingerprint"] for r in
            doc_fingerprint(df, "doc_id", "text", 4).collect()}
    assert 1 not in rows            # empty doc: no fingerprint row
    assert rows[2] is not None      # short doc: whole-text fingerprint
    assert rows[4] == rows[5]       # exact dups agree


def test_doc_chunking_empty_doc(spark, short_dir):
    out = entrymod.q_doc_chunking(spark, short_dir).toPandas()
    assert (out["doc_id"] == 1).sum() == 0          # empty doc: no chunks
    assert (out["doc_id"] == 2).sum() == 1
    assert out[out["doc_id"] == 2]["chunk_text"].iloc[0] == "ab"
    assert (out["chunk_idx"] < 0).sum() == 0        # no bogus [0, -1] rows


SHINGLE_QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "er_cc_clusters",
    "text_fingerprint",
    "doc_chunking",
]


@pytest.mark.parametrize("name", SHINGLE_QUERIES)
def test_oracle_parity_on_short_docs(spark, short_dir, name):
    """The driver's correctness gate, rerun on a corpus WITH short docs."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = _norm(qs[name](spark, short_dir).toPandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{short_dir}/documents.parquet'"
    )
    odf = _norm(con.sql(oracles[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf), f"{name}: spark={len(sdf)} oracle={len(odf)}"
    for c in sdf.columns:
        if sdf[c].dtype == np.float64:
            assert np.allclose(sdf[c], odf[c], rtol=0, atol=0, equal_nan=True), c
        else:
            assert sdf[c].equals(odf[c]), c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

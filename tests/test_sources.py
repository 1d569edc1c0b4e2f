import gzip
import pathlib
import shutil
import tempfile

import pytest

from belb_spark.sources.readers import (
    parse_kv_records,
    read_delimited,
    read_delimited_records,
    read_jsonl,
    read_tsv,
)


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="belb_src_")
    yield pathlib.Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_read_tsv_gzip_with_comments(spark, tmp):
    p = tmp / "genes.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("# generated file\n")
        f.write("gene_id\tsymbol\tsynonyms\n")
        f.write("1\tTP53\tp53|LFS1\n")
        f.write("2\tBRCA1\tRNF53\n")
    df = read_tsv(
        spark, str(p), schema="gene_id string, symbol string, synonyms string",
        comment="#",
    )
    rows = {r["symbol"]: r["synonyms"] for r in df.collect()}
    assert rows == {"TP53": "p53|LFS1", "BRCA1": "RNF53"}


def test_read_pipe_delimited_rrf(spark, tmp):
    p = tmp / "MRCONSO.RRF"
    p.write_text("C001|ENG|name one\nC002|ENG|name two\n")
    df = read_delimited(spark, str(p), "|", columns=["cui", "lat", "name"])
    assert {r["cui"] for r in df.collect()} == {"C001", "C002"}


def test_multiline_record_reader(spark, tmp):
    """Cellosaurus-style //-terminated records (belb S4)."""
    p = tmp / "cello.txt"
    p.write_text(
        "ID   CVCL_0001\nSY   HeLa S3; Hela-S3\nOX   9606\n//\n"
        "ID   CVCL_0002\nSY   K562\nOX   9606\n//\n"
    )
    recs = read_delimited_records(spark, str(p), "//\n")
    assert recs.count() == 2
    kv = parse_kv_records(recs)
    ids = {tuple(r["vals"]) for r in kv.filter("k = 'ID'").collect()}
    assert ids == {("CVCL_0001",), ("CVCL_0002",)}


def test_blankline_block_reader(spark, tmp):
    """PubTator-style blank-line-delimited blocks (belb S7)."""
    p = tmp / "corpus.pubtator"
    p.write_text(
        "1|t|Title one\n1|a|Abstract one\n1\t0\t5\tspan\tDisease\tD001\n\n"
        "2|t|Title two\n2|a|Abstract two\n\n"
    )
    recs = read_delimited_records(spark, str(p), "\n\n")
    assert recs.count() == 2


def test_read_jsonl_with_schema(spark, tmp):
    p = tmp / "refsnp.jsonl"
    p.write_text(
        '{"rsid": "rs1", "genes": [{"id": 7157}]}\n'
        '{"rsid": "rs2", "genes": []}\n'
    )
    df = read_jsonl(
        spark, str(p), schema="rsid string, genes array<struct<id: bigint>>"
    )
    from pyspark.sql import functions as F

    exploded = df.select("rsid", F.explode_outer("genes").alias("g"))
    got = {(r["rsid"], r["g"]["id"] if r["g"] else None) for r in exploded.collect()}
    assert got == {("rs1", 7157), ("rs2", None)}

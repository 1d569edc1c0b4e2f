import gzip
import pathlib
import shutil
import tempfile

import pytest

from belb_spark.sources.readers import (
    bioc_to_doc_span_tables,
    parse_kv_records,
    read_bioc,
    read_delimited,
    read_delimited_records,
    read_jsonl,
    read_tsv,
)

BIOC_XML = """<?xml version="1.0" encoding="UTF-8"?>
<collection><source>test</source>
 <document><id>d1</id>
  <passage><offset>0</offset><text>the IL6 gene binds TNF</text>
   <annotation id="a0"><infon key="type">gene</infon>
     <location offset="4" length="3"/><text>IL6</text></annotation>
   <annotation id="a1"><infon key="type">gene</infon>
     <location offset="19" length="3"/><text>TNF</text></annotation>
  </passage>
  <passage><offset>23</offset><text>second passage text</text>
   <annotation id="a2"><infon key="type">disease</infon>
     <location offset="30" length="7"/><text>passage</text></annotation>
  </passage>
 </document>
 <document><id>d2</id>
  <passage><offset>0</offset><text>no annotations here</text></passage>
 </document>
</collection>
"""

BIOC_JSON = {
    "source": "test",
    "documents": [
        {
            "id": "d1",
            "passages": [
                {
                    "offset": 0,
                    "text": "the IL6 gene binds TNF",
                    "annotations": [
                        {"id": "a0", "infons": {"type": "gene"},
                         "locations": [{"offset": 4, "length": 3}], "text": "IL6"},
                        {"id": "a1", "infons": {"type": "gene"},
                         "locations": [{"offset": 19, "length": 3}], "text": "TNF"},
                    ],
                },
                {
                    "offset": 23,
                    "text": "second passage text",
                    "annotations": [
                        {"id": "a2", "infons": {"type": "disease"},
                         "locations": [{"offset": 30, "length": 7}], "text": "passage"},
                    ],
                },
            ],
        },
        {"id": "d2", "passages": [{"offset": 0, "text": "no annotations here",
                                   "annotations": []}]},
    ],
}


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


def _norm_bioc_rows(df):
    return sorted(
        (r["doc_id"], r["passage_idx"], r["offset"], r["text"],
         tuple(sorted((a["ann_id"], a["start"], a["end"], a["text"], a["entity_type"])
                      for a in (r["annotations"] or []))))
        for r in df.collect()
    )


def test_read_bioc_xml_json_agree(spark, tmp):
    import json

    (tmp / "c.xml").write_text(BIOC_XML)
    (tmp / "c.json").write_text(json.dumps(BIOC_JSON))
    x = read_bioc(spark, str(tmp / "c.xml"), fmt="xml")
    j = read_bioc(spark, str(tmp / "c.json"), fmt="json")
    assert _norm_bioc_rows(x) == _norm_bioc_rows(j)
    assert x.count() == 3  # 2 passages of d1 + 1 of d2


def test_bioc_composes_with_span_operators(spark, tmp):
    """S8 -> (docs, spans) -> offset QAQC + T3 markers, end to end."""
    import json

    from belb_spark.operators.spans import check_span_offsets, mark_spans
    from pyspark.sql import functions as F

    (tmp / "c.json").write_text(json.dumps(BIOC_JSON))
    passages = read_bioc(spark, str(tmp / "c.json"), fmt="json")
    docs, spans = bioc_to_doc_span_tables(passages)
    # BioC offsets are document-absolute; after passage-local remap the
    # reference's offset contract (qaqc.py:27-58) must hold
    joined = spans.join(docs, "doc_id").select(
        "doc_id", "span_id", "start", "end", "span_text", "text"
    )
    assert check_span_offsets(joined) == 0
    marked = mark_spans(docs, spans)
    assert check_span_offsets(marked) == 0
    t = marked.filter(
        (F.col("doc_id") == "d1#0") & F.col("span_id").isNotNull()
    ).first()["text"]
    assert t == "the [MS] IL6 [ME] gene binds [MS] TNF [ME]"


def test_sinks_roundtrip(spark, tmp):
    """K1/K3/K4: TSV.gz and JSONL sinks round-trip through their readers."""
    from belb_spark.sources.sinks import write_jsonl, write_tsv

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, name string"
    )
    write_tsv(df, str(tmp / "out_tsv"), gzip=True, single_file=True)
    back = read_tsv(spark, str(tmp / "out_tsv"), schema="id long, name string")
    assert {(r["id"], r["name"]) for r in back.collect()} == {(1, "alpha"), (2, "beta")}
    import glob
    assert glob.glob(str(tmp / "out_tsv" / "*.csv.gz"))  # gzip codec applied

    write_jsonl(df, str(tmp / "out_jsonl"))
    back2 = read_jsonl(spark, str(tmp / "out_jsonl"), schema="id long, name string")
    assert back2.count() == 2


def test_read_tar_members(spark, tmp):
    """S3: tar.gz member stream — one row per member file."""
    import tarfile

    from belb_spark.sources.readers import read_tar_members

    p = tmp / "corpus.tar.gz"
    with tarfile.open(p, "w:gz") as tf:
        for name, data in [("a/doc1.txt", "hello one"), ("a/doc2.txt", "hello two"),
                           ("a/skip.bin", "binary-ish")]:
            import io

            b = data.encode()
            info = tarfile.TarInfo(name)
            info.size = len(b)
            tf.addfile(info, io.BytesIO(b))
    out = read_tar_members(spark, str(p), member_suffix=".txt")
    rows = {r["member"]: r["text"] for r in out.collect()}
    assert rows == {"a/doc1.txt": "hello one", "a/doc2.txt": "hello two"}

"""Source readers re-expressing belb's scan family (SURVEY.md §2.1).

Every belb source becomes a declarative ``spark.read`` with pushdown-capable
options where Spark has one, and a ``text`` + record-assembly plan where the
format is bespoke:

- S1 gzip TSV chunked scan            -> ``read_tsv`` (codec inferred; at
  scale: Iceberg/parquet, this is the landing adapter)
- S2 comment-skipping scan            -> ``read_tsv(comment='#')``
- S6 RRF pipe-delimited scan          -> ``read_delimited(sep='|')``
- S4 multi-line record scan (``//``-terminated Cellosaurus-style records)
  -> ``read_delimited_records`` via ``textinputformat.record.delimiter`` —
  record assembly happens in the InputFormat, so files still split across
  tasks (no whole-file reads)
- S7 blank-line-delimited block scan (PubTator-style) -> same mechanism with
  a ``\\n\\n`` delimiter
- S5 JSON-lines scan                  -> ``spark.read.json`` with explicit
  schema (no sampling pass at scale)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    comment: str | None = None,
) -> DataFrame:
    """gzip/plain TSV scan (belb S1/S2: belb/kbs/kb.py:332-358,
    belb/kbs/ctd_diseases/ctd_diseases.py:107-130). Explicit schema avoids
    the inference pass — mandatory at scale."""
    reader = spark.read.option("sep", "\t").option("header", str(header).lower())
    if comment:
        reader = reader.option("comment", comment)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "false")
    return reader.csv(path)


def read_delimited(
    spark: SparkSession, path: str, sep: str, columns: list[str] | None = None
) -> DataFrame:
    """Pipe/arbitrary-delimiter scan (belb S6 RRF: belb/kbs/umls/umls.py:55-97)."""
    df = spark.read.option("sep", sep).option("header", "false").csv(path)
    if columns:
        for i, c in enumerate(columns):
            df = df.withColumnRenamed(f"_c{i}", c)
        df = df.select(*columns)
    return df


def read_delimited_records(
    spark: SparkSession, path: str, record_delimiter: str
) -> DataFrame:
    """Multi-line record scan (belb S4 Cellosaurus ``//``-terminated records,
    belb/kbs/cellosaurus/cellosaurus.py:124-147; S7 PubTator blank-line
    blocks, belb/corpora/ncbi_disease/ncbi_disease.py:91-112).

    Uses the Hadoop TextInputFormat record delimiter, so record assembly is
    IO-layer work and large files still split across tasks. Returns one row
    per record in column ``record``."""
    conf = {"textinputformat.record.delimiter": record_delimiter}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    ).map(lambda kv: (kv[1],))
    df = spark.createDataFrame(rdd, "record string")
    return df.filter(F.trim("record") != "")


def parse_kv_records(records: DataFrame, kv_sep: str = r"\s+") -> DataFrame:
    """Key-value line parsing inside multi-line records (Cellosaurus-style
    ``ID   value`` lines): record -> map<key, array<values>>. Pure JVM."""
    lines = records.select(
        F.monotonically_increasing_id().alias("rid"),
        F.explode(F.split("record", "\n")).alias("line"),
    ).filter(F.trim("line") != "")
    kv = lines.select(
        "rid",
        F.regexp_extract("line", r"^(\S+)", 1).alias("k"),
        F.trim(F.regexp_replace("line", r"^\S+\s*", "")).alias("v"),
    )
    return kv.groupBy("rid", "k").agg(F.collect_list("v").alias("vals"))


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines scan (belb S5 dbSNP: belb/kbs/dbsnp/dbsnp.py:150-162);
    explicit schema skips Spark's sampling inference pass."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)

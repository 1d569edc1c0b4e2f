"""Sink family (SURVEY.md §2.1 K1-K5) — thin, explicit wrappers.

belb writes TSV.gz dictionaries (K1, belb/kbs/kb.py:226-272), bulk DB
inserts (K2, belb/kbs/db.py:150-210), JSON documents (K3), query-result TSVs
(K4, belb/scripts/*) and JSON side-artifacts (K5). Here:

- K1/K4 -> :func:`write_tsv` (gzip codec, single-file option for
  dictionary-sized outputs, many-part for big ones)
- K2    -> CheckpointStore parquet + manifest (checkpoint.py; Iceberg
  catalog in prod) — the engine's bulk landing path
- K3    -> :func:`write_jsonl` (one JSON object per line; gzip optional)
- K5    -> stage manifests + metrics.json (checkpoint.py:100-108)

``single_file=True`` coalesces to one partition — correct ONLY for
dictionary-sized outputs (belb's TSVs are exactly that); leave it False for
anything corpus-sized so the write stays parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(
    df: DataFrame,
    path: str,
    gzip: bool = True,
    header: bool = True,
    single_file: bool = False,
) -> None:
    """K1/K4: TSV[.gz] sink."""
    out = df.coalesce(1) if single_file else df
    writer = (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", str(header).lower())
    )
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.csv(path)


def write_jsonl(df: DataFrame, path: str, gzip: bool = False) -> None:
    """K3: JSON-lines document sink."""
    writer = df.write.mode("overwrite")
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.json(path)

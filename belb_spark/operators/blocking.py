"""Stage 2 — blocking: MinHash-LSH band keys ∪ token-prefix keys ∪ exact key.

Three key families per row (north rule: "MinHash-LSH band keys plus
normalized-token prefixes"):

- ``exact:`` sha256 of the canonicalized text — exact-duplicate groups come
  out for free and never enter the pairwise scorer (the dominant case in a
  code corpus: identical files vendored across repos).
- ``pfx:`` canonical tokens [2:4] (skipping the 2-token boilerplate prefix)
  — the analogue of belb's name-based grouping (belb/kbs/query.py:234-291).
- ``mh{b}:`` MinHash band keys: token-3gram shingles → P seeded xxhash64
  min-hashes → bands of r values. All JVM-side (xxhash64 inside a
  higher-order ``transform`` — no Python, no UDF).

Scale design: keys are emitted as one exploded (uid, block_key) table,
repartitioned by block_key (aligned with the downstream self-join shuffle).
Skew is handled structurally in pairs.py via anchor-capped joins rather than
by dropping hot blocks (see pairs.py docstring).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


@dataclass(frozen=True)
class BlockingConfig:
    minhash_perms: int = 16
    band_size: int = 2           # rows per band -> perms/band_size band keys
    shingle_width: int = 3
    use_prefix: bool = True
    prefix_start: int = 2        # 0-based token offset of the prefix key
    prefix_len: int = 2
    # 'udf': one Arrow UDF — blake2b per shingle once + affine permutations
    #        in numpy (fast, the default); 'jvm': pure-JVM xxhash64 inside
    #        higher-order transforms (no Python at all, ~interpreted-expr
    #        cost). Key *sets* differ between strategies (different hash
    #        families) but both are deterministic and near-dup-equivalent.
    strategy: str = "udf"

    @property
    def n_bands(self) -> int:
        return self.minhash_perms // self.band_size


def _affine_consts(perms: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed odd multipliers / offsets (splitmix64 stream, seed 0x9E3779...)
    — deterministic across runs and machines, mod-2^64 arithmetic."""
    a, b = [], []
    x = np.uint64(0x9E3779B97F4A7C15)
    for _ in range(perms):
        x = np.uint64((int(x) * 6364136223846793005 + 1442695040888963407) % 2**64)
        a.append(int(x) | 1)
        x = np.uint64((int(x) * 6364136223846793005 + 1442695040888963407) % 2**64)
        b.append(int(x))
    return np.array(a, dtype=np.uint64), np.array(b, dtype=np.uint64)


def make_band_keys_udf(cfg: BlockingConfig):
    """Arrow-batched band-key generator: norm_tokens -> array of LSH band
    keys. One blake2b(8B) per distinct shingle, then ``perms`` affine
    permutations vectorized in numpy (min over shingles per permutation)."""
    perms, band_size, width = cfg.minhash_perms, cfg.band_size, cfg.shingle_width
    n_bands = cfg.n_bands
    A, B = _affine_consts(perms)

    def _band_keys(tokens: pd.Series) -> pd.Series:
        out = []
        for ts in tokens:
            n = len(ts)
            if n >= width:
                shingles = {" ".join(ts[i : i + width]) for i in range(n - width + 1)}
            else:
                shingles = {" ".join(ts)}
            hs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
                    )
                    for s in shingles
                ),
                dtype=np.uint64,
                count=len(shingles),
            )
            # perms × shingles affine family, wraparound mod 2^64
            sig = (A[:, None] * hs[None, :] + B[:, None]).min(axis=1)
            out.append(
                [
                    f"mh{b}:" + "_".join(str(sig[b * band_size + r]) for r in range(band_size))
                    for b in range(n_bands)
                ]
            )
        return pd.Series(out)

    return F.pandas_udf(_band_keys, ArrayType(StringType()))


def shingles_col(tokens: str | Column, width: int = 3) -> Column:
    """Distinct token n-gram shingles of an array<string> column, built with
    ``sequence`` + higher-order ``transform`` (pure codegen, no explode).

    Short-doc semantics (aligned with the Arrow band-key UDF above and the
    DuckDB oracles): 0 < n < width emits ONE whole-text shingle (slice clips
    to the array); an empty token array emits NO shingles (its only gram is
    the empty string, removed below — tokens are non-empty so no legitimate
    gram is ""). Grams are built with ``slice`` — never ``element_at`` — so
    the expression is ANSI-safe (Spark 4 runs with ANSI on, where an
    out-of-range element_at throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT on any
    doc shorter than the width). Deliberately NOT wrapped in a CaseWhen
    guard: a ``when`` around the higher-order transform defeats codegen of
    the whole expression (measured 5× slower at sf0.1).
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    n = F.size(t)
    idx = F.sequence(F.lit(0), F.greatest(n - width, F.lit(0)))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(t, (i + 1).cast("int"), width))
    )
    return F.array_remove(F.array_distinct(gram), "")


def minhash_signature(shingles: Column, perms: int) -> Column:
    """array<long> of length ``perms``: sig[p] = min over shingles of
    xxhash64(p, shingle). Deterministic under the fixed seed set 0..perms-1."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(p), s))) for p in range(perms)]
    )


def band_keys(sig: Column, cfg: BlockingConfig) -> Column:
    """array<string> of LSH band keys ``mh{b}:h1_h2_...``."""
    keys = []
    for b in range(cfg.n_bands):
        parts = [
            F.element_at(sig, b * cfg.band_size + r + 1).cast("string")
            for r in range(cfg.band_size)
        ]
        keys.append(F.concat_ws("_", F.lit(f"mh{b}:"), *parts))
    return F.array(*keys)


def block_keys(normalized: DataFrame, cfg: BlockingConfig = BlockingConfig()) -> DataFrame:
    """normalized (from normalize.normalize) -> (uid, block_key) exploded.

    Returns one row per (uid, key); repartitioned by block_key so the
    downstream within-block self-join shuffles once on an aligned layout.

    PRECONDITION (ADVICE r4): the input must be unique on ``uid`` — there is
    deliberately no global distinct here (it was a full extra shuffle that
    never removed a row on the pipeline path, where normalize guarantees
    uniqueness). A caller passing duplicate-uid rows gets duplicate
    (uid, block_key) rows that inflate block sizes, window ranks, and the
    observed pair stats downstream.
    """
    df = normalized
    exact = F.concat(F.lit("exact:"), F.sha2(F.col("norm_text"), 256))
    keys = [F.array(exact)]
    if cfg.use_prefix:
        pfx = F.concat(
            F.lit("pfx:"),
            F.concat_ws(
                "|", F.slice(F.col("norm_tokens"), cfg.prefix_start + 1, cfg.prefix_len)
            ),
        )
        keys.append(F.array(pfx))
    if cfg.minhash_perms > 0:
        if cfg.strategy == "udf":
            keys.append(make_band_keys_udf(cfg)(F.col("norm_tokens")))
        else:
            sh = shingles_col("norm_tokens", cfg.shingle_width)
            sig = minhash_signature(sh, cfg.minhash_perms)
            keys.append(band_keys(sig, cfg))

    # the content key h (when the normalize stage stored one) rides the
    # explode: the candidate self-join then emits PRE-KEYED pairs
    # (uid, h per side) and the scoring stage needs no uid→h translation
    # joins at all (r4). 16 bytes per exploded row, dictionary-encoded at
    # rest (each uid's h repeats once per key family).
    carry = ["uid", "h"] if "h" in df.columns else ["uid"]
    # dedupe PER ROW, not globally: every key is family-prefixed ("exact:",
    # "pfx:", "mh{b}:") and unique within its family, so a (uid, key) pair
    # can only repeat inside one row's concat array — array_distinct is the
    # whole dedup. The r1-r3 global `.distinct()` here was semantically a
    # no-op that shuffled + hash-aggregated the full exploded table once
    # per run (removed r4).
    out = df.select(
        *carry, F.explode(F.array_distinct(F.concat(*keys))).alias("block_key")
    )
    return out.repartition("block_key")

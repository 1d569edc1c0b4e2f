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

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BlockingConfig:
    minhash_perms: int = 16
    band_size: int = 2           # rows per band -> perms/band_size band keys
    shingle_width: int = 3
    use_prefix: bool = True
    prefix_start: int = 2        # 0-based token offset of the prefix key
    prefix_len: int = 2

    @property
    def n_bands(self) -> int:
        return self.minhash_perms // self.band_size


def shingles_col(tokens: str | Column, width: int = 3) -> Column:
    """Distinct token n-gram shingles of an array<string> column, built with
    ``sequence`` + higher-order ``transform`` (pure codegen, no explode)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    n = F.size(t)
    idx = F.sequence(F.lit(0), F.greatest(n - width, F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(width)]),
    )
    return F.array_distinct(gram)


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
        sh = shingles_col("norm_tokens", cfg.shingle_width)
        sig = minhash_signature(sh, cfg.minhash_perms)
        keys.append(band_keys(sig, cfg))

    out = (
        df.select("uid", F.explode(F.concat(*keys)).alias("block_key"))
        .distinct()
    )
    return out.repartition("block_key")

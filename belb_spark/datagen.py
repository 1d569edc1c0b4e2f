"""Deterministic synthetic data generator + pandas gold oracle.

Synthesizes the north-rule input table ``repos(repo, path, commit, lang,
content)`` together with the belb-style side tables (FIXTURES.md):

- ``synonym_dict(identifier, name, description)`` — mirrors belb's kb
  dictionary rows (reference: belb/kbs/schema.py:139-195,
  belb/preprocessing/data.py:667-686); description codes 0=symbol,
  1=synonym, 2=abbreviation (belb/preprocessing/data.py:20).
- ``history(old_identifier, new_identifier)`` — merged/renamed ids incl.
  chains and obsoletes (belb/kbs/schema.py:197-217, belb/kbs/kb.py:455-486).
- ``identifier_mapping(original_identifier, internal_identifier)`` —
  alternative-id equivalence (belb/kbs/schema.py:219-239,
  belb/kbs/ctd_diseases/ctd_diseases.py:120-121).
- ``gold(uid, gold_cluster)`` — connected component over (same prototype) ∪
  (history edges) ∪ (mapping alternatives) ∪ (identical-synset merges,
  belb/kbs/query.py:97-194), computed here in plain pandas — never by Spark.
- ``labeled_pairs(uid_a, uid_b, block_key, is_match, split, slice)`` —
  evaluation oracle, pairs sharing a blocking key, frozen splits like
  belb/metadata/*/splits.json.

Everything is seeded (default 42); two runs with the same config are
byte-identical. Perturbation magnitudes are bounded (FIXTURES.md §1) so a
correct pipeline reaches pairwise F1 ≥ 0.99.
"""

from __future__ import annotations

import hashlib
import random
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

LANGS = ["python", "java", "go", "js", "rust"]
LANG_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}
LANG_WEIGHTS = [0.45, 0.2, 0.15, 0.12, 0.08]  # skewed, per FIXTURES.md

_WORDS = [
    "parse", "load", "init", "util", "index", "merge", "node", "graph",
    "cache", "query", "token", "split", "batch", "score", "block", "hash",
    "write", "read", "scan", "join", "group", "sort", "map", "fold",
]

TOKEN_RE = re.compile(r"[a-z0-9_]+")


@dataclass(frozen=True)
class GenConfig:
    seed: int = 42
    n_entities: int = 60           # gold entities
    n_distractors: int = 100       # singleton rows
    vocab_size: int = 2000
    dict_entities: int = 200       # entries in synonym_dict
    content_tokens: int = 40       # tokens per prototype body
    max_members: int = 12          # k range per prototype
    n_hot: int = 2                 # prototypes with ~hot_members members (skew)
    hot_members: int = 100
    synset_dup_pairs: int = 3      # entity pairs merged via identical synset
    max_pairs_per_block: int = 400


TINY = GenConfig()
SMALL = GenConfig(n_entities=600, n_distractors=800, n_hot=4)
BENCH = GenConfig(n_entities=4000, n_distractors=5000, n_hot=8, hot_members=200)
# scaling-evidence scale: big enough that per-stage fixed costs amortize and
# the CPU-bound stages dominate (~250k rows, ~1.8M candidate pairs)
SCALING = GenConfig(n_entities=20_000, n_distractors=25_000, n_hot=12, hot_members=200)
# xl: enough candidate pairs (~5M) that the vectorized scoring stage is
# compute-bound again at N=4 cores — the regime the scaling-efficiency
# contract describes (10^12-file corpus); r2's 4x-faster kernels made the
# 'scaling' scale fixed-cost-dominated at small N
XL = GenConfig(n_entities=60_000, n_distractors=60_000, n_hot=16, hot_members=200)
# xxl: ~1.9M rows / ~12M candidate pairs — after the r2 scoring-stage
# optimizations (slim hash-keyed shuffle + distinct-payload scoring) even xl
# finishes the stage in ~29s at 16 cores, leaving Spark's fixed ~15s of
# serial scheduling/commit as the Amdahl cap; the N->4N efficiency contract
# needs an input where parallel compute dominates that floor
XXL = GenConfig(n_entities=150_000, n_distractors=150_000, n_hot=20, hot_members=200)

SCALES = {
    "tiny": TINY, "small": SMALL, "bench": BENCH,
    "scaling": SCALING, "xl": XL, "xxl": XXL,
}

# bump when generation logic changes so /tmp bench caches invalidate
DATAGEN_VERSION = 2


def cache_dir(scale_name: str) -> str:
    cfg = SCALES[scale_name]
    return f"/tmp/belb_bench_data_{scale_name}_{cfg.seed}_v{DATAGEN_VERSION}"


def _vocab(cfg: GenConfig) -> list[str]:
    return [f"{_WORDS[i % len(_WORDS)]}{i:04d}" for i in range(cfg.vocab_size)]


def _commit_hex(seed: int, tag: str) -> str:
    return hashlib.sha1(f"{seed}:{tag}".encode()).hexdigest()


def build_synonym_dict(cfg: GenConfig) -> pd.DataFrame:
    """dict symbols are the first ``dict_entities`` vocab tokens; each entity
    carries 2 synonyms and 1 abbreviation (description codes 0/1/2)."""
    vocab = _vocab(cfg)
    rows = []
    for ident in range(cfg.dict_entities):
        sym = vocab[ident]
        rows.append((ident, sym, 0))
        rows.append((ident, f"{sym}_alt", 1))
        rows.append((ident, f"{sym}_v2", 1))
        rows.append((ident, f"{sym[:3]}{ident:03d}", 2))
    return pd.DataFrame(rows, columns=["identifier", "name", "description"])


def _canon_map(syn: pd.DataFrame) -> dict[str, str]:
    """name -> canonical symbol of its identifier (keep-preferred semantics,
    belb/kbs/kb.py:251-263)."""
    symbols = syn[syn.description == 0].set_index("identifier")["name"].to_dict()
    return {r.name: symbols[r.identifier] for r in syn.itertuples(index=False)}


def _render(tokens: list[str], fn: str) -> str:
    """Format a token sequence as a code-like file body."""
    lines = [f"def {fn}():", f'    """{" ".join(tokens[:6])}"""']
    body = tokens[6:]
    for i in range(0, len(body), 5):
        chunk = body[i : i + 5]
        if len(chunk) >= 3:
            lines.append(f"    {chunk[0]} = {chunk[1]}({', '.join(chunk[2:])})")
        else:
            lines.append("    " + " ".join(chunk))
    lines.append(f"    return {tokens[-1]}")
    return "\n".join(lines) + "\n"


def oracle_tokens(content: str, canon: dict[str, str]) -> list[str]:
    """The pandas twin of the Spark normalize stage (operators/normalize.py):
    lowercase, tokenize on [a-z0-9_]+, canonicalize via synonym dict."""
    toks = TOKEN_RE.findall(content.lower())
    return [canon.get(t, t) for t in toks]


def oracle_block_key(tokens: list[str]) -> str:
    """Prefix blocking key: canonical tokens [2:4] of the stream (positions
    0-1 are the ``def fn_x`` boilerplate, carrying no entity signal)."""
    return "|".join(tokens[2:4]) if len(tokens) >= 4 else "|".join(tokens)


class _Perturb:
    """Bounded surface perturbations mirroring belb's noise (SURVEY.md §2.9)."""

    def __init__(self, rng: random.Random, syn: pd.DataFrame):
        self.rng = rng
        by_id: dict[int, dict[int, list[str]]] = {}
        for r in syn.itertuples(index=False):
            by_id.setdefault(r.identifier, {}).setdefault(r.description, []).append(r.name)
        self.sym_to_variants = {
            d[0][0]: d.get(1, []) + d.get(2, []) for d in by_id.values() if 0 in d
        }

    def apply(self, tokens: list[str], kind: int) -> tuple[list[str], str | None]:
        """Returns (tokens, ws_mode). ws_mode tweaks rendering whitespace only."""
        toks = list(tokens)
        if kind == 1:  # whitespace/unicode jitter (transform.py:154-163)
            return toks, self.rng.choice(["nbsp", "double", "trail"])
        if kind == 2:  # quote/tab variants (data.py:680-686)
            i = self.rng.randrange(2, len(toks))
            toks[i] = f'"{toks[i]}"'
            return toks, "tab"
        if kind in (3, 4):  # synonym / abbreviation rename
            cand = [i for i, t in enumerate(toks) if t in self.sym_to_variants]
            if cand:
                i = self.rng.choice(cand)
                variants = self.sym_to_variants[toks[i]]
                toks[i] = self.rng.choice(variants)
            return toks, None
        if kind == 5:  # one bounded token edit (keeps Jaccard >= ~0.9)
            i = self.rng.randrange(3, len(toks))
            t = toks[i]
            j = self.rng.randrange(len(t))
            toks[i] = t[:j] + "x" + t[j + 1 :]
            return toks, None
        return toks, None  # kind 0: exact copy

    def render(self, tokens: list[str], fn: str, ws: str | None) -> str:
        text = _render(tokens, fn)
        if ws == "nbsp":
            text = text.replace(" = ", "  = ", 1)
        elif ws == "double":
            text = text.replace(", ", ",  ")
        elif ws == "trail":
            text = text.replace("\n", " \n", 3)
        return text


def generate(cfg: GenConfig = TINY) -> dict[str, pd.DataFrame]:
    """Build all tables. Deterministic in cfg (incl. seed)."""
    rng = random.Random(cfg.seed)
    vocab = _vocab(cfg)
    syn = build_synonym_dict(cfg)
    canon = _canon_map(syn)
    perturb = _Perturb(rng, syn)

    # --- entities, prototypes, equivalence side-tables -------------------
    history_rows: list[tuple[str, str]] = []
    mapping_rows: list[tuple[str, int]] = []
    proto_entity: dict[str, int] = {}   # prototype id -> gold entity
    proto_tokens: dict[str, list[str]] = {}
    next_internal = 10_000

    def base_tokens() -> list[str]:
        # >=6 dict symbols so synonym renames have targets
        toks = [vocab[rng.randrange(cfg.dict_entities)] for _ in range(8)]
        toks += [vocab[rng.randrange(cfg.vocab_size)] for _ in range(cfg.content_tokens - 8)]
        rng.shuffle(toks)
        return toks

    entity_base: dict[int, list[str]] = {}
    for g in range(cfg.n_entities):
        toks = base_tokens()
        # identical-synset merge pairs: entity 2k+1 clones entity 2k's content
        if g % 2 == 1 and (g // 2) < cfg.synset_dup_pairs:
            toks = list(entity_base[g - 1])
        entity_base[g] = toks
        n_protos = rng.choice([1, 1, 2, 2, 3])
        proto_ids = [f"P{g}_{p}" for p in range(n_protos)]
        for p, pid in enumerate(proto_ids):
            ptoks = list(toks)
            if p > 0:  # tiny prototype-level edit, still >= 0.9 similar
                i = rng.randrange(3, len(ptoks))
                ptoks[i] = ptoks[i] + "b"
            proto_entity[pid] = g
            proto_tokens[pid] = ptoks
        # history edges chain the prototypes of one entity (old -> new),
        # incl. length>=2 chains to force fixpoint resolution
        for p in range(1, n_protos):
            history_rows.append((proto_ids[p], proto_ids[p - 1]))
        # alternative external ids for the head prototype
        mapping_rows.append((f"EXT:{g}", next_internal))
        mapping_rows.append((proto_ids[0], next_internal))
        next_internal += 1
    # a few obsolete ids (new_identifier = "-1", data.py:24)
    for g in range(0, min(5, cfg.n_entities)):
        history_rows.append((f"OBS{g}", "-1"))

    # --- member rows ------------------------------------------------------
    hot = set(list(proto_tokens.keys())[: cfg.n_hot])
    rows = []
    row_meta = []  # (gold_entity,)
    slot = 0
    for pid, ptoks in proto_tokens.items():
        k = cfg.hot_members if pid in hot else rng.randint(1, cfg.max_members)
        for m in range(k):
            kind = 0 if m == 0 else rng.choice([0, 1, 1, 2, 3, 3, 4, 5, 5])
            toks, ws = perturb.apply(ptoks, kind)
            lang = rng.choices(LANGS, weights=LANG_WEIGHTS)[0]
            content = perturb.render(toks, fn=f"fn_{pid.lower()}", ws=ws)
            repo = f"org_{slot % 97:03d}/proj_{slot % 31:02d}"
            path = f"src/mod_{slot % 53:02d}/{pid.lower()}_{m}.{LANG_EXT[lang]}"
            commit = _commit_hex(cfg.seed, f"{pid}:{m}")
            rows.append((repo, path, commit, lang, content))
            row_meta.append(proto_entity[pid])
            slot += 1

    # --- distractors (singletons; some hard negatives share block key) ---
    n_gold_entities = cfg.n_entities
    for d in range(cfg.n_distractors):
        toks = base_tokens()
        if d % 3 == 0:  # hard negative: same first-3 tokens as a gold entity
            src = entity_base[rng.randrange(cfg.n_entities)]
            toks[0:3] = src[0:3]
        elif d % 5 == 1:  # confusable: ~40% of a gold entity's tokens, incl.
            # the block prefix — must be REJECTED by the scorer (tests
            # precision, not just blocking)
            src = entity_base[rng.randrange(cfg.n_entities)]
            k40 = max(3, int(len(src) * 0.4))
            toks[0:k40] = src[0:k40]
        lang = rng.choices(LANGS, weights=LANG_WEIGHTS)[0]
        content = _render(toks, fn=f"fn_d{d}")
        repo = f"org_{(d + 7) % 97:03d}/proj_{(d + 3) % 31:02d}"
        path = f"src/extra/d_{d}.{LANG_EXT[lang]}"
        commit = _commit_hex(cfg.seed, f"D:{d}")
        rows.append((repo, path, commit, lang, content))
        row_meta.append(n_gold_entities + d)  # singleton gold cluster
        slot += 1

    repos = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    repos["_entity"] = row_meta
    # uid = row_number over (repo, path, commit) — the pipeline's ingest order
    repos = repos.sort_values(["repo", "path", "commit"], kind="mergesort").reset_index(drop=True)
    repos["uid"] = np.arange(1, len(repos) + 1, dtype=np.int64)

    # --- gold clusters: union-find over entity merges --------------------
    parent = {g: g for g in range(n_gold_entities + cfg.n_distractors)}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # identical-synset merge (belb/kbs/query.py:97-194): entities generated
    # with identical base content are the same entity
    for g in range(cfg.n_entities):
        if g % 2 == 1 and (g // 2) < cfg.synset_dup_pairs:
            union(g - 1, g)
    # (history + mapping edges connect prototypes *within* one entity, so
    # they are already same-cluster; kept in side tables for the KB stage.)
    repos["gold_entity_root"] = repos["_entity"].map(find)
    cluster_min_uid = repos.groupby("gold_entity_root")["uid"].transform("min")
    gold = pd.DataFrame({"uid": repos["uid"], "gold_cluster": cluster_min_uid.astype(np.int64)})

    # --- labeled pairs at shared block key (design key: tokens[1:3]) ------
    canon_toks = repos["content"].map(lambda c: oracle_tokens(c, canon))
    repos["_block"] = canon_toks.map(oracle_block_key)
    gold_by_uid = gold.set_index("uid")["gold_cluster"].to_dict()
    prng = random.Random(cfg.seed + 1)
    pair_rows = []
    for bkey, grp in repos.groupby("_block"):
        uids = sorted(grp["uid"].tolist())
        if len(uids) < 2:
            continue
        pairs = [(a, b) for i, a in enumerate(uids) for b in uids[i + 1 :]]
        if len(pairs) > cfg.max_pairs_per_block:
            pairs = prng.sample(pairs, cfg.max_pairs_per_block)
            pairs.sort()
        for a, b in pairs:
            pair_rows.append((a, b, bkey, gold_by_uid[a] == gold_by_uid[b]))
    labeled = pd.DataFrame(pair_rows, columns=["uid_a", "uid_b", "block_key", "is_match"])

    # frozen splits by gold entity (belb/metadata/*/splits.json analogue)
    def entity_split(e: int) -> str:
        h = int(hashlib.md5(f"{cfg.seed}:{e}".encode()).hexdigest()[:8], 16) % 10
        return "train" if h < 6 else ("dev" if h < 8 else "test")

    ent_root = repos.set_index("uid")["gold_entity_root"].to_dict()
    split_of = {e: entity_split(e) for e in set(ent_root.values())}
    labeled["split"] = [
        split_of[ent_root[a]] if split_of[ent_root[a]] == split_of[ent_root[b]] else "train"
        for a, b in zip(labeled["uid_a"], labeled["uid_b"])
    ]
    test_entities = {e for e, s in split_of.items() if s == "test"}
    labeled["slice"] = [
        "zeroshot" if (ent_root[a] in test_entities and ent_root[b] in test_entities) else "standard"
        for a, b in zip(labeled["uid_a"], labeled["uid_b"])
    ]

    repos_out = repos[["uid", "repo", "path", "commit", "lang", "content"]].copy()
    history = pd.DataFrame(history_rows, columns=["old_identifier", "new_identifier"])
    mapping = pd.DataFrame(mapping_rows, columns=["original_identifier", "internal_identifier"])
    return {
        "repos": repos_out,
        "synonym_dict": syn,
        "history": history,
        "identifier_mapping": mapping,
        "gold": gold,
        "labeled_pairs": labeled,
    }


def save(tables: dict[str, pd.DataFrame], out_dir: str) -> None:
    import pathlib

    p = pathlib.Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    for name, df in tables.items():
        # small row groups so Spark can split the single file into parallel
        # scan ranges (1 row group == 1 unsplittable task otherwise)
        df.to_parquet(p / f"{name}.parquet", index=False, row_group_size=4096)


def generate_and_save(out_dir: str, cfg: GenConfig = TINY) -> dict[str, pd.DataFrame]:
    tables = generate(cfg)
    save(tables, out_dir)
    return tables

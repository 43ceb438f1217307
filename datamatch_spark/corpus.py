"""Deterministic synthetic corpus of interleaved text+media documents.

Input shape per BASELINE.json input_hint:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

The generator plants entity clusters (members share a base identity
with controlled typos, date perturbations < d_max, optional first/last
swaps, and hot blocking keys for skew), with exact labeled pair ground
truth derivable without running the matcher. Everything is a pure
function of (seed, doc index) — no RNG state, so generation is
deterministic under any partitioning, and the same flat rows can be
produced driver-side in pandas for the reference-oracle harness.

Match fields are *projected out of* ``spans`` by kind
(``project_fields``); the matcher never rewrites ``spans``, and
``spans_preserved`` verifies the per-row span-sequence invariant
(kind, text, media_ref, order) byte-for-byte.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import date, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "CorpusConfig",
    "generate_documents",
    "generate_flat_pandas",
    "gold_pairs_pandas",
    "gold_pairs",
    "project_fields",
    "spans_preserved",
    "SPAN_SCHEMA",
    "DOC_SCHEMA",
]

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
DOC_SCHEMA = f"doc_id string, spans {SPAN_SCHEMA}"

_LAST = [
    "beech", "dupas", "brown", "bowen", "rhea", "haynes", "terry", "robinson",
    "martin", "nguyen", "garcia", "smith", "johnson", "williams", "jones",
    "miller", "davis", "rodriguez", "martinez", "hernandez", "lopez", "wilson",
    "anderson", "thomas", "taylor", "moore", "jackson", "white", "harris",
    "sanchez", "clark", "ramirez", "lewis", "walker", "young", "allen", "king",
    "wright", "scott", "torres", "hill", "flores", "green", "adams", "nelson",
    "baker", "hall", "rivera", "campbell", "mitchell",
]
_FIRST = [
    "freddie", "demia", "latoya", "cherri", "teneisha", "lauri", "alexis",
    "john", "jim", "ted", "bill", "bob", "mary", "patricia", "jennifer",
    "linda", "elizabeth", "barbara", "susan", "jessica", "sarah", "karen",
    "james", "robert", "michael", "david", "william", "richard", "joseph",
    "christopher", "daniel", "matthew", "anthony", "mark", "donald", "steven",
    "andrew", "kenneth", "joshua", "kevin",
]
_AGENCY = [
    "slidell pd", "gretna pd", "nola pd", "kenner pd", "metairie so",
    "baton rouge pd", "lafayette pd", "shreveport pd",
]

FIELD_KINDS = ["last", "first", "dob", "agency", "blk"]


@dataclass
class CorpusConfig:
    n_docs: int = 1000
    seed: int = 42
    members_per_entity: int = 3  # max cluster size
    singleton_rate: int = 34  # % of entities where rank-2 member is noise
    hot_pct: int = 4  # % of entities assigned the single hot blocking key
    date_d_max: int = 30
    n_media_spans: int = 2
    # "ambiguous": realistic name collisions -> some non-clique
    #   components, where the reference's hash-order greedy split is
    #   itself nondeterministic (SURVEY.md §8.2).
    # "clean": entities are cliques at threshold 0.8 with unique base
    #   names -> order-insensitive, used for the strict F1>=0.99 gate.
    profile: str = "ambiguous"
    # number of hash-derived blocking buckets in the clean profile;
    # controls block size (and hence candidate-pair volume) at bench
    # scale: expected block rows ~ n_docs / blk_buckets
    blk_buckets: int = 40


def _h(seed: int, *parts) -> int:
    m = hashlib.blake2b(digest_size=8)
    m.update(repr((seed,) + parts).encode())
    return int.from_bytes(m.digest(), "big")


def _typo(s: str, h: int) -> str:
    """One deterministic edit (substitute/insert/delete/duplicate)."""
    if not s:
        return s
    pos = h % len(s)
    op = (h >> 8) % 4
    c = "abcdefghijklmnopqrstuvwxyz"[(h >> 16) % 26]
    if op == 0:
        return s[:pos] + c + s[pos + 1 :]
    if op == 1:
        return s[:pos] + c + s[pos:]
    if op == 2 and len(s) > 2:
        return s[:pos] + s[pos + 1 :]
    return s[:pos] + s[pos] + s[pos:]


def _typo_inner(s: str, h: int) -> str:
    """Deterministic single edit that never touches position 0 (keeps
    Jaro-Winkler member-pair scores comfortably above 0.8)."""
    if len(s) < 3:
        return s + "e"
    pos = 1 + h % (len(s) - 1)
    op = (h >> 8) % 3
    c = "abcdefghijklmnopqrstuvwxyz"[(h >> 16) % 26]
    if op == 0:
        return s[:pos] + c + s[pos + 1 :]
    if op == 1:
        return s[:pos] + c + s[pos:]
    return s[:pos] + s[pos] + s[pos:]


def _flat_doc_clean(i: int, cfg: CorpusConfig) -> dict:
    """Clique-profile doc: per-entity base names, light perturbations
    -> all member pairs score >= ~0.8.

    UNIQUENESS BOUND: the (last, first) base tuple cycles every
    len(_LAST)*len(_FIRST) = 2000 entities, so the strict
    "no cross-entity bridges -> order-insensitive clustering"
    invariant holds only below 2000 entities — the F1-gate corpora
    (test_reference_parity, a few hundred docs) sit well inside it.
    Bench-scale corpora (>> 2000 entities) can occasionally bridge
    same-name entities whose dobs land close; throughput benches
    tolerate that (nothing asserts cliqueness there), but do NOT use
    bench-scale clean corpora for exact-cluster golden tests."""
    k = cfg.members_per_entity
    entity = i // k
    rank = i % k
    eh = _h(cfg.seed, "entity", entity)
    is_noise = rank == k - 1 and (eh % 100) < cfg.singleton_rate
    if is_noise:
        nh = _h(cfg.seed, "noise", i)
        last = f"{_LAST[nh % len(_LAST)]}q{i % 89}"
        first = _FIRST[(nh >> 8) % len(_FIRST)]
        dob = date(1950 + (nh >> 16) % 50, 1 + (nh >> 24) % 12, 1 + (nh >> 32) % 28)
        agency = _AGENCY[(nh >> 40) % len(_AGENCY)]
        ent_label = -i - 1
        blk = f"b{(nh >> 48) % cfg.blk_buckets}"
    else:
        last = _LAST[entity % len(_LAST)]
        first = _FIRST[(entity // len(_LAST)) % len(_FIRST)]
        dob = date(1950 + (eh >> 16) % 50, 1 + (eh >> 24) % 12, 1 + (eh >> 32) % 28)
        agency = _AGENCY[(eh >> 40) % len(_AGENCY)]
        ent_label = entity
        mh = _h(cfg.seed, "member", entity, rank)
        if rank == 1:
            if mh % 2 == 0:
                last = _typo_inner(last, mh >> 8)
            else:
                first = _typo_inner(first, mh >> 8)
        elif rank >= 2:
            dob = dob + timedelta(days=1 + (mh >> 24) % 12)
        blk = "hot" if (eh >> 48) % 100 < cfg.hot_pct else f"b{eh % cfg.blk_buckets}"
    return {
        "doc_id": f"d{i:09d}",
        "last": last,
        "first": first,
        "dob": dob,
        "agency": agency,
        "blk": blk,
        "entity": ent_label,
    }


def _flat_doc(i: int, cfg: CorpusConfig) -> dict:
    """Pure function (seed, doc index) -> flat record + labels."""
    if cfg.profile == "clean":
        return _flat_doc_clean(i, cfg)
    k = cfg.members_per_entity
    entity = i // k
    rank = i % k
    eh = _h(cfg.seed, "entity", entity)
    is_noise = rank == k - 1 and (eh % 100) < cfg.singleton_rate
    if is_noise:
        # an unrelated singleton living in the same id space
        nh = _h(cfg.seed, "noise", i)
        last = _LAST[nh % len(_LAST)]
        first = _FIRST[(nh >> 8) % len(_FIRST)]
        dob = date(1950 + (nh >> 16) % 50, 1 + (nh >> 24) % 12, 1 + (nh >> 32) % 28)
        agency = _AGENCY[(nh >> 40) % len(_AGENCY)]
        ent_label = -i - 1  # unique -> never matches anything
    else:
        last = _LAST[eh % len(_LAST)]
        first = _FIRST[(eh >> 8) % len(_FIRST)]
        dob = date(1950 + (eh >> 16) % 50, 1 + (eh >> 24) % 12, 1 + (eh >> 32) % 28)
        agency = _AGENCY[(eh >> 40) % len(_AGENCY)]
        ent_label = entity
        if rank > 0:
            mh = _h(cfg.seed, "member", entity, rank)
            if mh % 3 == 0:
                last = _typo(last, mh >> 8)
            if (mh >> 4) % 3 == 0:
                first = _typo(first, mh >> 16)
            dob = dob + timedelta(days=(mh >> 24) % max(1, cfg.date_d_max - 5))
    hot = (eh >> 48) % 100 < cfg.hot_pct
    blk = "hot" if hot else f"{last[:1]}{dob.year % 10}"
    return {
        "doc_id": f"d{i:09d}",
        "last": last,
        "first": first,
        "dob": dob,
        "agency": agency,
        "blk": blk,
        "entity": ent_label,
    }


def _spans_for(flat: dict, cfg: CorpusConfig) -> list:
    """Interleave field spans with opaque media spans."""
    spans = []
    off = 0
    sh = _h(cfg.seed, "media", flat["doc_id"])
    media_slots = {
        (sh >> (8 * j)) % (len(FIELD_KINDS) + 1) for j in range(cfg.n_media_spans)
    }
    for pos, kind in enumerate(FIELD_KINDS):
        if pos in media_slots:
            spans.append(("media", None, f"m://{flat['doc_id']}/{off}", off))
            off += 1
        val = flat[kind]
        text = val.isoformat() if isinstance(val, date) else str(val)
        spans.append((kind, text, None, off))
        off += 1
    if len(FIELD_KINDS) in media_slots:
        spans.append(("media", None, f"m://{flat['doc_id']}/{off}", off))
    return spans


def generate_flat_pandas(cfg: CorpusConfig) -> pd.DataFrame:
    """Driver-side flat corpus (for the reference-oracle harness)."""
    return pd.DataFrame([_flat_doc(i, cfg) for i in range(cfg.n_docs)])


def gold_pairs_pandas(cfg: CorpusConfig) -> set:
    """Labeled ground-truth doc_id pairs (same planted entity)."""
    flat = [_flat_doc(i, cfg) for i in range(cfg.n_docs)]
    by_entity: dict = {}
    for f in flat:
        if f["entity"] >= 0:
            by_entity.setdefault(f["entity"], []).append(f["doc_id"])
    out = set()
    for members in by_entity.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                out.add((a, b))
    return out


def generate_documents(spark: SparkSession, cfg: CorpusConfig) -> DataFrame:
    """Distributed interleaved-documents corpus (doc_id, spans)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                flat = _flat_doc(int(i), cfg)
                rows.append((flat["doc_id"], _spans_for(flat, cfg)))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    n_parts = max(1, min(_corpus_parallelism(spark), cfg.n_docs // 250 + 1))
    return spark.range(0, cfg.n_docs, numPartitions=n_parts).mapInPandas(
        gen, schema=DOC_SCHEMA
    )


def _corpus_parallelism(spark: SparkSession) -> int:
    """Partition count for generated tables — race-free in fresh
    standalone sessions (see session.effective_parallelism: a corpus
    generated before executors register would otherwise land on 2
    partitions and serialize every downstream pre-shuffle stage)."""
    from .session import effective_parallelism

    return effective_parallelism(spark)


def gold_pairs(spark: SparkSession, cfg: CorpusConfig) -> DataFrame:
    """Ground-truth pairs as a DataFrame (idx_a < idx_b), distributed.

    Membership is derivable from the doc index alone, so this is a
    self-join of (doc_id, entity) labels — no quadratic work.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                f = _flat_doc(int(i), cfg)
                if f["entity"] >= 0:
                    rows.append((f["doc_id"], f["entity"]))
            yield pd.DataFrame(rows, columns=["doc_id", "entity"])

    n_parts = max(1, min(_corpus_parallelism(spark), cfg.n_docs // 250 + 1))
    labels = spark.range(0, cfg.n_docs, numPartitions=n_parts).mapInPandas(
        gen, "doc_id string, entity long"
    )
    a = labels.select(F.col("doc_id").alias("idx_a"), "entity")
    b = labels.select(F.col("doc_id").alias("idx_b"), "entity")
    return a.join(b, on="entity").where(F.col("idx_a") < F.col("idx_b")).drop("entity")


def project_fields(docs: DataFrame, kinds: list[str] | None = None) -> DataFrame:
    """Project match fields out of ``spans`` by kind; ``spans`` is
    carried through untouched (the per-row invariant).

    Pure Column expressions: ``filter(spans, s -> s.kind = k)[0].text``.
    """
    kinds = kinds or FIELD_KINDS
    cols = [F.col("doc_id")]
    for k in kinds:
        first_span = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit(k))[0]
        c = first_span["text"]
        if k == "dob":
            c = c.cast("date")
        cols.append(c.alias(k))
    cols.append(F.col("spans"))
    return docs.select(*cols)


def spans_preserved(inp: DataFrame, out: DataFrame, key: str = "doc_id") -> bool:
    """True iff every output row's spans equal the input row's spans
    (kind, text, media_ref, order). FULL-outer join: a dropped input
    row or an output row with a rewritten/unknown key is a violation
    too — an inner join would silently skip exactly the rows a broken
    pipeline corrupts."""
    # row-count equality first: the full-outer join matches each
    # DUPLICATED output row to the same input row, so a pipeline that
    # doubled the corpus would otherwise pass (review r5)
    if inp.count() != out.count():
        return False
    left = inp.select(F.col(key), F.col("spans").alias("__spans_in"))
    joined = out.select(F.col(key), "spans").join(left, on=key, how="full")
    bad = joined.where(
        ~F.col("spans").eqNullSafe(F.col("__spans_in"))
    ).limit(1).count()
    return bad == 0

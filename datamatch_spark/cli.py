"""spark-submit entry point: the whole linkage pipeline from one JSON
config — the deployment shape the reference's notebook-only API lacks
(reference matchers.py:220-474 is constructor-driven; a cluster run
needs a submittable main).

    spark-submit --py-files datamatch_spark.zip \\
        -m datamatch_spark.cli  # via a 1-line runner, or:
    python -m datamatch_spark.cli --config job.json

The config is declarative JSON (specs below), so a job is a reviewable
artifact: the same file runs at sf0.001 on a laptop and on a
1000-executor cluster — only ``spark.master`` / submit-time confs
change. ``main`` prints ONE machine-readable JSON summary line on
stdout (pair/cluster counts, outputs written), everything else to
stderr.

Config schema (all spec objects are ``{"type": ..., **kwargs}``):

    {
      "input":  {"a": {"path": "...", "format": "parquet"},
                 "b": {...}},          # "b" present => match mode
      "row_key": "row_key",
      "index":  {"type": "columns", "cols": ["year"]},
      "scorer": {"last": {"type": "jaro_winkler"},    # dict of field
                 "first": {"type": "jaro_winkler"}},  # -> SimSumScorer
      "variator": {"type": "swap", "col_a": "first", "col_b": "last"},
      "filters": [{"type": "dissimilar", "col": "kind"}],
      "threshold": 0.83,
      "outputs": [{"kind": "clusters", "path": "out/",
                   "format": "parquet"}],
      "pairing": {"salt_threshold": 2000},   # PairingConfig kwargs
      "checkpoint_dir": null,
      "metrics_path": null,
      "validate": true,
      "spark": {"shuffle_partitions": null, "conf": {}}
    }

Index specs: ``noop``; ``columns`` (cols, ignore_key_error,
index_elements); ``multi`` (indices: [spec...], combine_keys);
``phonetic`` (col); ``qgram`` (col, q, max_df, max_df_frac);
``sorted_neighborhood`` (cols, window); ``suffix`` (col, min_len,
max_block_size); ``geo_grid`` (lat_col, lon_col, d_km).

Similarity specs: ``string`` / ``levenshtein`` (max_len);
``jaro_winkler`` (prefix_weight, max_len); ``date`` (d_max);
``absolute_number`` (d_max); ``relative_number`` (pc_max);
``monge_elkan`` (inner kwargs); ``token_set`` (mode); ``geo``
(d_max_km, over struct<lat,lon> columns).

Output kinds: ``clusters`` / ``pairs`` (parquet or excel),
``decision`` (stderr report), ``golden_records`` (parquet; needs
``rules`` — column -> survivorship rule — and honors
``include_singletons``; dedup mode only).

Scorer specs: a plain ``{field: similarity_spec}`` dict (the
reference's dict sugar -> SimSumScorer), or typed: ``simsum``
(fields); ``absolute`` (column, score, ignore_key_error); ``max`` /
``min`` (scorers: [spec...]); ``alter`` (scorer, values, alter).

Filter specs: ``dissimilar`` (col, ignore_key_error);
``nonoverlapping`` (start, end).

Variator specs: ``noop``; ``swap`` (col_a, col_b).

Output specs: kind ``clusters`` | ``pairs`` (the 3-part pair report) |
``decision``, format ``parquet`` | ``excel``, plus the save_* kwargs
(lower_bound, step, sample_counts, include_exact_matches).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .filters import BaseFilter, DissimilarFilter, NonOverlappingFilter
from .indices import (
    BaseIndex,
    ColumnsIndex,
    GeoGridIndex,
    MultiIndex,
    NoopIndex,
    PhoneticIndex,
    QGramIndex,
    SortedNeighborhoodIndex,
    SuffixArrayIndex,
)
from .matchers import ThresholdMatcher
from .pairing import PairingConfig
from .scorers import (
    AbsoluteScorer,
    AlterScorer,
    BaseScorer,
    MaxScorer,
    MinScorer,
    SimSumScorer,
)
from .similarities import (
    AbsoluteNumericalSimilarity,
    BaseSimilarity,
    DateSimilarity,
    JaroWinklerSimilarity,
    GeoSimilarity,
    MongeElkanSimilarity,
    RelativeNumericalSimilarity,
    StringSimilarity,
    TokenSetSimilarity,
)

__all__ = [
    "build_index",
    "build_similarity",
    "build_scorer",
    "build_filter",
    "build_variator",
    "run_job",
    "main",
]


def _take(spec: dict, what: str) -> tuple[str, dict]:
    """(type, kwargs) from a spec object; loud on malformed input —
    config errors must fail the submit, not a 3-hour stage."""
    if not isinstance(spec, dict) or "type" not in spec:
        raise ValueError(
            f"{what} spec must be an object with a 'type' key, got {spec!r}"
        )
    kw = {k: v for k, v in spec.items() if k != "type"}
    return str(spec["type"]).lower(), kw


def _construct(cls, kw: dict, what: str):
    """Build with keyword args; rewrap TypeError so the JSON author
    sees which SPEC is wrong, not a Python traceback frame."""
    try:
        return cls(**kw)
    except TypeError as e:
        raise ValueError(f"bad {what} spec for {cls.__name__}: {e}") from e


def build_index(spec: dict) -> BaseIndex:
    t, kw = _take(spec, "index")
    if t == "noop":
        return _construct(NoopIndex, kw, "index")
    if t == "columns":
        return _construct(ColumnsIndex, kw, "index")
    if t == "multi":
        children = kw.pop("indices", None)
        if not isinstance(children, list) or not children:
            raise ValueError("multi index spec needs a non-empty 'indices' list")
        return _construct(
            MultiIndex, {"indices": [build_index(c) for c in children], **kw},
            "index",
        )
    if t == "phonetic":
        return _construct(PhoneticIndex, kw, "index")
    if t == "qgram":
        return _construct(QGramIndex, kw, "index")
    if t == "sorted_neighborhood":
        return _construct(SortedNeighborhoodIndex, kw, "index")
    if t == "suffix":
        return _construct(SuffixArrayIndex, kw, "index")
    if t == "geo_grid":
        return _construct(GeoGridIndex, kw, "index")
    raise ValueError(f"unknown index type {t!r}")


_SIMS = {
    "string": StringSimilarity,
    "levenshtein": StringSimilarity,
    "jaro_winkler": JaroWinklerSimilarity,
    "date": DateSimilarity,
    "absolute_number": AbsoluteNumericalSimilarity,
    "relative_number": RelativeNumericalSimilarity,
    "monge_elkan": MongeElkanSimilarity,
    "token_set": TokenSetSimilarity,
    "geo": GeoSimilarity,
}


def build_similarity(spec: dict) -> BaseSimilarity:
    t, kw = _take(spec, "similarity")
    if t not in _SIMS:
        raise ValueError(
            f"unknown similarity type {t!r} (have {sorted(_SIMS)})"
        )
    return _construct(_SIMS[t], kw, "similarity")


def _build_fields(fields: dict) -> dict[str, BaseSimilarity]:
    if not isinstance(fields, dict) or not fields:
        raise ValueError("scorer fields must be a non-empty object")
    return {k: build_similarity(v) for k, v in fields.items()}


def build_scorer(spec: dict) -> BaseScorer:
    # the reference's dict sugar: {field: similarity} -> SimSumScorer
    # (reference matchers.py:89-94). A typed spec has a 'type' key
    # whose value is a string; a field named "type" mapping to a
    # similarity OBJECT is still sugar.
    if isinstance(spec, dict) and not isinstance(spec.get("type"), str):
        return SimSumScorer(_build_fields(spec))
    t, kw = _take(spec, "scorer")
    if t == "simsum":
        fields = kw.pop("fields", None)
        if kw:
            raise ValueError(
                f"bad scorer spec for SimSumScorer: unknown keys {sorted(kw)}"
            )
        return SimSumScorer(_build_fields(fields))
    if t == "absolute":
        # JSON-friendly names: column/score
        kw.setdefault("column_name", kw.pop("column", None))
        if kw["column_name"] is None:
            raise ValueError("absolute scorer spec needs 'column'")
        return _construct(AbsoluteScorer, kw, "scorer")
    if t in ("max", "min"):
        children = kw.pop("scorers", None)
        if not isinstance(children, list) or not children:
            raise ValueError(f"{t} scorer spec needs a non-empty 'scorers' list")
        cls = MaxScorer if t == "max" else MinScorer
        return _construct(
            cls, {"scorers": [build_scorer(c) for c in children], **kw},
            "scorer",
        )
    if t == "alter":
        inner = kw.pop("scorer", None)
        if inner is None:
            raise ValueError("alter scorer spec needs 'scorer'")
        values = kw.pop("values", None)
        alter = kw.pop("alter", None)
        if values is None or alter is None:
            raise ValueError("alter scorer spec needs 'values' and 'alter'")
        alter_fn = _alter_fn(alter)
        return _construct(
            AlterScorer,
            {"scorer": build_scorer(inner), "values": values,
             "alter": alter_fn, **kw},
            "scorer",
        )
    raise ValueError(f"unknown scorer type {t!r}")


def _alter_fn(alter):
    """JSON-encodable alter -> Column-to-Column callable. A bare number
    sets a constant score; ``{"op": "multiply"|"add"|"set", "value": v}``
    composes with the wrapped score (arbitrary callables remain a
    Python-API feature)."""
    from pyspark.sql import functions as F

    if isinstance(alter, (int, float)) and not isinstance(alter, bool):
        v = float(alter)
        return lambda s: F.lit(v)
    if isinstance(alter, dict) and "op" in alter and "value" in alter:
        op, v = str(alter["op"]).lower(), float(alter["value"])
        if op == "set":
            return lambda s: F.lit(v)
        if op == "multiply":
            return lambda s: s * v
        if op == "add":
            return lambda s: s + v
        raise ValueError(f"unknown alter op {op!r}")
    raise ValueError(
        "alter must be a number or {'op', 'value'} in JSON configs"
    )


def build_filter(spec: dict) -> BaseFilter:
    t, kw = _take(spec, "filter")
    if t == "dissimilar":
        return _construct(DissimilarFilter, kw, "filter")
    if t == "nonoverlapping":
        return _construct(NonOverlappingFilter, kw, "filter")
    raise ValueError(f"unknown filter type {t!r}")


def build_variator(spec: dict | None):
    from .variators import Swap, Variator

    if spec is None:
        return None
    t, kw = _take(spec, "variator")
    if t == "noop":
        return _construct(Variator, kw, "variator")
    if t == "swap":
        # accept the JSON-friendly col_a/col_b aliases
        for short, full in (("col_a", "column_a"), ("col_b", "column_b")):
            if short in kw:
                kw[full] = kw.pop(short)
        return _construct(Swap, kw, "variator")
    raise ValueError(f"unknown variator type {t!r}")


def _read_input(spark: SparkSession, spec: dict) -> DataFrame:
    if not isinstance(spec, dict) or "path" not in spec:
        raise ValueError(f"input spec needs a 'path', got {spec!r}")
    fmt = str(spec.get("format", "parquet")).lower()
    reader = spark.read
    for k, v in (spec.get("options") or {}).items():
        reader = reader.option(k, v)
    if fmt == "parquet":
        df = reader.parquet(spec["path"])
    elif fmt == "csv":
        df = reader.option("header", spec.get("header", True)).csv(spec["path"])
    elif fmt == "json":
        df = reader.json(spec["path"])
    elif fmt in ("table", "iceberg"):
        # Iceberg tables register in the catalog (session.py configs);
        # DataFrameReader.table applies the accumulated options
        # (snapshot-id / as-of-timestamp time travel etc.) to v2
        # sources — spark.table() would silently drop them
        df = reader.table(spec["path"])
    else:
        raise ValueError(f"unknown input format {fmt!r}")
    cols = spec.get("columns")
    if cols:
        df = df.select(*cols)  # column pruning straight to the scan
    return df


def _write_outputs(
    matcher: ThresholdMatcher, outputs: list[dict], threshold: float
) -> list[dict]:
    written = []
    for spec in outputs:
        if not isinstance(spec, dict) or "kind" not in spec:
            raise ValueError(f"output spec needs a 'kind', got {spec!r}")
        kind = str(spec["kind"]).lower()
        fmt = str(spec.get("format", "parquet")).lower()
        path = spec.get("path")
        if path is None and kind != "decision":
            raise ValueError(f"output spec for {kind!r} needs a 'path'")
        kw: dict[str, Any] = {
            k: spec[k]
            for k in ("lower_bound", "step", "sample_counts",
                      "include_exact_matches")
            if k in spec
        }
        thr = float(spec.get("threshold", threshold))
        if kind == "clusters":
            if fmt == "parquet":
                matcher.save_clusters_to_parquet(path, thr, **kw)
            elif fmt == "excel":
                matcher.save_clusters_to_excel(path, thr, **kw)
            else:
                raise ValueError(f"unknown output format {fmt!r}")
        elif kind == "pairs":
            if fmt == "parquet":
                matcher.save_pairs_to_parquet(path, thr, **kw)
            elif fmt == "excel":
                matcher.save_pairs_to_excel(path, thr, **kw)
            else:
                raise ValueError(f"unknown output format {fmt!r}")
        elif kind == "golden_records":
            rules = spec.get("rules")
            if not isinstance(rules, dict) or not rules:
                raise ValueError(
                    "golden_records output spec needs a non-empty "
                    "'rules' dict (column -> survivorship rule)"
                )
            gr_kw = {
                k: spec[k] for k in ("include_singletons",) if k in spec
            }
            if fmt != "parquet":
                raise ValueError(
                    f"golden_records output supports parquet, got {fmt!r}"
                )
            matcher.get_golden_records(
                rules, thr, **gr_kw
            ).write.mode("overwrite").parquet(path)
        elif kind == "decision":
            # stdout is reserved for main()'s single JSON summary line;
            # the human-readable report goes to stderr
            import contextlib

            with contextlib.redirect_stdout(sys.stderr):
                matcher.print_decision(thr)
        else:
            raise ValueError(f"unknown output kind {kind!r}")
        written.append({"kind": kind, "format": fmt, "path": path})
    return written


def run_job(spark: SparkSession, config: dict) -> dict:
    """Build the matcher from ``config`` and write every requested
    output. Returns the summary dict ``main`` prints."""
    t0 = time.time()
    inputs = config.get("input") or {}
    if "a" not in inputs:
        raise ValueError("config.input must contain 'a'")
    dfa = _read_input(spark, inputs["a"])
    dfb = _read_input(spark, inputs["b"]) if "b" in inputs else None

    threshold = config.get("threshold")
    if threshold is None:
        raise ValueError("config.threshold is required")
    threshold = float(threshold)
    if "scorer" not in config:
        raise ValueError("config.scorer is required")

    # the sink goes INTO the matcher (its native lineage path records
    # wall_ms and per-block candidate stats alongside the partitions
    # table — re-recording after the fact would lose both)
    metrics_path = config.get("metrics_path")
    if metrics_path:
        from .metrics import MetricsSink

        sink = MetricsSink(spark, metrics_path)
    else:
        sink = None

    pairing = config.get("pairing")
    matcher = ThresholdMatcher(
        index=build_index(config.get("index") or {"type": "noop"}),
        scorer=build_scorer(config["scorer"]),
        dfa=dfa,
        dfb=dfb,
        variator=build_variator(config.get("variator")),
        filters=[build_filter(f) for f in (config.get("filters") or [])],
        row_key=config.get("row_key", "row_key"),
        pairing_config=(
            _construct(PairingConfig, pairing, "pairing")
            if pairing else None
        ),
        validate=bool(config.get("validate", True)),
        checkpoint_dir=config.get("checkpoint_dir"),
        score_partitions=config.get("score_partitions"),
        keyed_tables=config.get("keyed_tables"),
        metrics_sink=sink,
    )
    run_id = sink.run_id if sink is not None else None

    drow = matcher.decision_counts(threshold).collect()[0]
    decision = {
        "match_threshold": drow["match_threshold"],
        "number_of_matched_pairs": drow["number_of_matched_pairs"],
    }
    outputs = _write_outputs(
        matcher, config.get("outputs") or [], threshold
    )
    mode = "dedup" if dfb is None else "match"
    return {
        "mode": mode,
        "threshold": threshold,
        "decision": decision,
        "outputs": outputs,
        "metrics_run_id": run_id,
        "wall_s": round(time.time() - t0, 3),
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="datamatch_spark",
        description="Run a record-linkage job from a JSON config "
        "(spark-submit-friendly: python -m datamatch_spark.cli).",
    )
    p.add_argument("--config", required=True, help="path to the job JSON")
    p.add_argument(
        "--master",
        default=None,
        help="Spark master override (omit under spark-submit, whose "
        "--master is inherited; defaults to local[$SPARK_GRAFT_CPUS] "
        "when standalone)",
    )
    args = p.parse_args(argv)
    with open(args.config) as f:
        config = json.load(f)

    import os

    from .session import get_spark

    sconf = config.get("spark") or {}
    master = args.master or sconf.get("master")
    if master is None and os.environ.get("PYSPARK_GATEWAY_PORT"):
        # launched by spark-submit: the JVM gateway already exists and
        # carries the submit-time --master conf. Setting a builder
        # master here would OVERRIDE it (e.g. force a yarn job onto
        # local mode) — inherit instead.
        master = "inherit"
    spark = get_spark(
        master=master,
        shuffle_partitions=sconf.get("shuffle_partitions"),
        extra_conf=sconf.get("conf"),
    )
    summary = run_job(spark, config)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())

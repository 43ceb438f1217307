"""Local approximation of the driver's correctness gate.

Runs each __spark_entry__.queries() entry AND its oracle_sql() twin at a
given sf dir, sorts columns by name and rows by all values, and compares
row count / schema-width / values (floats to 6dp).  Usage:

    python scripts/oracle_check.py [sf_dir] [query ...]

With no query names, checks every query that has an oracle row.
"""
from __future__ import annotations

import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from datamatch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wanted = set(sys.argv[2:])

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    results, bad = {}, []
    for name, fn in queries.items():
        if wanted and name not in wanted:
            continue
        if name not in oracles:
            if not wanted:
                continue
            sdf = fn(spark, sf_dir)
            n = sdf.count()
            results[name] = {"spark_rows": n, "oracle": None}
            print(f"{name}: rows-only, spark_rows={n}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            o = con.execute(oracles[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            _, s_norm = _norm_rows(list(sdf.columns), s_rows)
            _, o_norm = _norm_rows(o_cols, o_rows)
            rows_match = len(s_rows) == len(o_rows)
            schema_match = s_cols == sorted(o_cols)
            hash_match = s_norm == o_norm
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(s_rows),
                "oracle_rows": len(o_rows),
            }
            ok = rows_match and schema_match and hash_match
            if not ok:
                bad.append(name)
                detail = ""
                if not schema_match:
                    detail = f" spark_cols={s_cols} oracle_cols={sorted(o_cols)}"
                elif not hash_match and rows_match:
                    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
                        if a != b:
                            detail = f" first_diff@{i}: spark={a} oracle={b}"
                            break
                print(f"{name}: FAIL rows={len(s_rows)}/{len(o_rows)}{detail}")
            else:
                print(f"{name}: ok ({len(s_rows)} rows)")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            results[name] = {"err": str(e)[:500]}
            print(f"{name}: ERROR {e}")
    print(json.dumps({"failed": bad, "n": len(results)}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

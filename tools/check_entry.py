"""Local simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir, runs the
matching ``oracle_sql()`` through DuckDB on the same parquet files, and
compares row count + column names + order-insensitive value multiset
(floats rounded to 9 significant digits before hashing, mirroring a
hash-of-sorted-values comparison). Usage:

    python tools/check_entry.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

VIEWS = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "~null"
    if isinstance(v, float):
        if math.isnan(v):
            return "~nan"
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as ent
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark(app_name="check-entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for v in VIEWS:
        con.execute(
            f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{sf_dir}/{v}.parquet')"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [rows-only]")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        got, gcols = canon(rows, cols)
        want, wcols = canon(orows, ocols)
        if gcols != wcols:
            print(f"FAIL  {name}: columns {gcols} != {wcols}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL  {name}: rowcount {len(got)} != {len(want)}")
            n_fail += 1
        elif got != want:
            diffs = [(g, w) for g, w in zip(got, want) if g != w][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(got)} rows ({dt:.1f}s)")
    print("entry() smoke:", end=" ")
    try:
        out = ent.entry(spark)
        n = len(out.collect())
        print(f"ok, {n} rows, schema {out.schema.simpleString()}")
    except Exception as e:
        print(f"FAIL {type(e).__name__}: {e}")
        n_fail += 1
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

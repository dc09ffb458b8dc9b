"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given sf dir, then compares row count, column-name sets, and
order-insensitive values (exact for ints/strings, bit-exact-or-report for
floats). Run before committing:

    python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from educational_vector_database_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept space- AND comma-separated query lists; reject unknown names
    # LOUDLY — a typo'd filter that matches nothing reports a vacuous
    # "FAILURES: 0" otherwise (round-10 near-miss: a comma-joined list
    # silently skipped every query)
    only = {n for a in sys.argv[2:] for n in a.split(",") if n}
    spark = get_spark(shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # directory-style table (e.g. the generated /tmp/sf1): DuckDB
            # needs the part-file glob, Spark reads the directory as-is
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}",
              file=sys.stderr)
        return 2
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        # order-insensitive: sort both by the column-name-sorted tuple
        # (repr key — sortable even with NULLs / mixed types in a column)
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        skey = sorted((tuple(canon(r[i]) for i in order) for r in srows), key=repr)
        dkey = sorted((tuple(canon(r[i]) for i in dorder) for r in drows), key=repr)
        maxdiff = 0.0
        exact = True
        for sr, dr in zip(skey, dkey):
            for a, b in zip(sr, dr):
                if isinstance(a, float) and isinstance(b, float):
                    if not (a == b or (math.isnan(a) and math.isnan(b))):
                        exact = False
                        maxdiff = max(maxdiff, abs(a - b))
                elif a != b:
                    exact = False
                    maxdiff = math.inf
        if exact:
            print(f"PASS {name}: rows={len(srows)} ({dt:.1f}s)")
        else:
            print(f"FAIL {name}: value mismatch, max_float_diff={maxdiff}")
            failures += 1
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

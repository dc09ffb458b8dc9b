"""Dump `.explain("formatted")` for a SUBSET of declared queries to files.

Usage:
    python tools/dump_plan_subset.py <outdir> <suffix> q1,q2,...

Writes <outdir>/<query>_<suffix>.txt for each query — the per-round
before/after plan evidence (plans/rNN/), complementing the full PLANS.md
dump. Queries whose construction itself runs Spark jobs (walk composites,
hub-entry collects) still dump fine: construction completes, then the final
frame's formatted plan is written.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_LOG4J = os.path.join(_REPO, "tools", "log4j2-quiet.properties")
if os.path.exists(_LOG4J):
    _opt = f"-Dlog4j2.configurationFile=file:{_LOG4J}"
    if _opt not in os.environ.get("SPARK_SUBMIT_OPTS", ""):
        os.environ["SPARK_SUBMIT_OPTS"] = (
            os.environ.get("SPARK_SUBMIT_OPTS", "") + " " + _opt).strip()

import __spark_entry__ as entrymod  # noqa: E402
from educational_vector_database_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="evd-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

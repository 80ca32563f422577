"""Run the full oracle-backed registry sweep at an arbitrary SF dir.

The driver's correctness gate runs at sf0.01; this script replays the same
Spark-vs-DuckDB comparison at sf1 (10x the bench SF) to validate that
correctness holds through an order-of-magnitude scale-up — the round-6
scale-validation task. Records per-query status + wall time to JSON.

Usage: python scripts/sweep_sf1.py [sf_dir] [out_json] [name_filter...]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
import traceback

import duckdb

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else str(ROOT / ".scale" / "sf1")
OUT = sys.argv[2] if len(sys.argv) > 2 else str(ROOT / "SWEEP_sf1.json")
ONLY = set(sys.argv[3:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    from pyspark.sql import SparkSession

    from nornicdb_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        # the sweep compare collects full result sets; pair-mining
        # queries legitimately return >1 GiB at sf1
        .config("spark.driver.maxResultSize", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    # resume: keep prior passes from an interrupted sweep (the file is
    # rewritten after every query), re-run anything else
    results: dict[str, dict] = {}
    out_path = pathlib.Path(OUT)
    if out_path.exists():
        try:
            results = {
                k: v
                for k, v in json.loads(out_path.read_text()).items()
                if v.get("status") == "pass"
            }
        except (ValueError, AttributeError):
            results = {}
    names = [
        n
        for n in QUERIES
        if n in ORACLES and n not in results and (not ONLY or n in ONLY)
    ]
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            compare(QUERIES[name](spark, SF_DIR), con, ORACLES[name])
            status, err = "pass", None
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            status = "fail"
            err = f"{type(e).__name__}: {e}"[:400]
            traceback.print_exc(limit=3)
        dt = round(time.time() - t0, 2)
        results[name] = {"status": status, "sec": dt, "err": err}
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({dt}s)", flush=True)
        pathlib.Path(OUT).write_text(json.dumps(results, indent=1))

    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    print(f"\n{n_pass}/{len(results)} pass -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Driver-environment simulation: run the oracle gate on a VANILLA
SparkSession (no repo confs — the driver builds its own session), so any
query that silently depends on get_spark()'s settings (UTC timezone,
AQE, shuffle partitions, arrow) fails HERE instead of in the driver's
CORRECTNESS stamp. load_table is responsible for setting the confs each
query actually needs at runtime.

Usage: python tools/vanilla_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from tests.oracle_util import assert_matches_oracle, duckdb_con

    con = duckdb_con(sf_dir)
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, con, oracles[name])
                print(f"{name:<42} OK")
            else:
                print(f"{name:<42} rows-only: {df.count()}")
        except Exception as exc:  # noqa: BLE001 — report every failure
            failures.append(name)
            print(f"{name:<42} FAIL {str(exc)[:160]}")
    if failures:
        print(f"\n{len(failures)} FAILURES on vanilla session: {failures}")
        return 1
    print("\nall queries green on a vanilla session")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

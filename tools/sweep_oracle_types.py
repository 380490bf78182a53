#!/usr/bin/env python3
"""Sweep every oracle SQL for result columns whose DuckDB type would not
hash identically to Spark's output under a dtype-sensitive comparison.

The driver's hash is dtype-sensitive; Spark emits int64/int32/float64.
DuckDB silently widens sum(BIGINT) to HUGEINT and that widening leaks
through // into derived columns (the round-11 `sample_mixture_mw` fail).
This tool runs each oracle against the sf tables with LIMIT 0 (type
inference only — instant) and flags HUGEINT / INT128 / DECIMAL columns.

Usage: python3 tools/sweep_oracle_types.py <sfDir> <oracleSqlJson>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DECIMAL is flagged too: Spark's decimal and DuckDB's decimal hash
# differently through pandas unless both sides cast; every oracle in this
# repo follows the ::BIGINT / ::DOUBLE convention instead.
BAD = ("HUGEINT", "INT128", "UHUGEINT", "DECIMAL")


def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_json) as f:
        oracles = json.load(f)
    n_flag = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                   if any(b in str(t).upper() for b in BAD)]
            if bad:
                n_flag += 1
                print(f"FLAG {name}: {bad}")
        except Exception as e:  # noqa: BLE001
            n_flag += 1
            print(f"ERR  {name}: {str(e)[:200]}")
    print(f"\n{len(oracles)} oracles, {n_flag} flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

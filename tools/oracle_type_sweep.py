"""Type-level oracle sweep (round-5 hardening, VERDICT r4 item 1).

The local parity mirror (tests/test_oracle_parity.py) compares
string-normalized VALUES, so it cannot see type-encoding divergence —
exactly how the r3/r4 ``sessionize`` driver red row (DuckDB HUGEINT from an
un-cast window SUM vs Spark bigint; values identical) survived two rounds.

This sweep plans every registered oracle on DuckDB and the matching query on
Spark (schema-only; nothing is executed on the Spark side) and reports, per
column:

* any DuckDB HUGEINT/UHUGEINT output (always a bug for us — Spark has no
  int128, so the driver's value hash can never match);
* any signedness/width/family divergence between the two engines'
  column types, for eyeballing.

Usage: ``python tools/oracle_type_sweep.py [sf_dir]`` — exits non-zero if
any HUGEINT column is found.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB type name -> coarse family we expect Spark to agree with.
_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BLOB": "bytes", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
}

_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "binary": "bytes", "boolean": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
}


def _spark_family(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith(("array", "map", "struct")):
        return "nested"
    return _SPARK_FAMILY.get(dt, dt)


def _duck_family(dt: str) -> str:
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt.endswith("[]") or dt.startswith(("STRUCT", "MAP", "LIST")):
        return "nested"
    return _FAMILY.get(dt, dt)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("oracle-type-sweep")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    hugeint_hits: list[str] = []
    family_notes: list[str] = []
    errors: list[str] = []
    for name in sorted(oracles):
        try:
            rel = con.sql(f"SELECT * FROM ({oracles[name]}) __q LIMIT 0")
            duck = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: duckdb plan error: {e}")
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            sp = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: spark plan error: {e}")
            continue
        for col, dt in duck:
            if dt in ("HUGEINT", "UHUGEINT"):
                hugeint_hits.append(f"{name}.{col}: DuckDB {dt} (Spark {sp.get(col)})")
                continue
            sf_ = _spark_family(sp.get(col, "<missing>"))
            df_ = _duck_family(dt)
            if sf_ != df_:
                family_notes.append(
                    f"{name}.{col}: duckdb={dt} spark={sp.get(col, '<missing>')}"
                )

    print(f"swept {len(oracles)} oracles at {sf_dir}")
    if errors:
        print(f"\n== PLAN ERRORS ({len(errors)}) ==")
        print("\n".join(errors))
    if hugeint_hits:
        print(f"\n== HUGEINT OUTPUTS — always a driver hash mismatch ({len(hugeint_hits)}) ==")
        print("\n".join(hugeint_hits))
    if family_notes:
        print(f"\n== family divergences (review; may be benign) ({len(family_notes)}) ==")
        print("\n".join(family_notes))
    if not (errors or hugeint_hits or family_notes):
        print("clean: no HUGEINT outputs, no family divergences")
    return 1 if (hugeint_hits or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())

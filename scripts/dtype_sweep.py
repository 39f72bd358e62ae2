"""Cross-engine result dtype sweep.

The driver's value-hash is dtype-sensitive (a DuckDB HUGEINT 0 hashes
differently from a BIGINT 0 even though the local repr-based compare
calls them equal).  This script runs every registered oracle on DuckDB
and the matching Spark builder, then diffs the *Arrow-level* column
types so any integer-width / decimal / timestamp mismatch is caught
before the driver sees it.

Usage: python scripts/dtype_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from ripple_server_spark.catalog import TABLES  # noqa: E402
from ripple_server_spark.plans.registry import SPECS  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# Spark simpleString -> the DuckDB arrow types it may legitimately map to.
OK = {
    "bigint": {"int64"},
    "int": {"int32"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string", "large_string"},
    "date": {"date32[day]"},
    "boolean": {"bool"},
    "binary": {"binary", "large_binary"},
    "timestamp": {"timestamp[us]", "timestamp[us, tz=UTC]"},
    "timestamp_ntz": {"timestamp[us]"},
}


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark()
    bad = 0
    for name, spec in SPECS.items():
        if spec.oracle is None:
            continue
        try:
            ora = con.execute(spec.oracle).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            print(f"ORACLE-ERR {name}: {e}")
            bad += 1
            continue
        sdf = spec.builder(spark, SF_DIR)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        otypes = {f.name: str(f.type) for f in ora.schema}
        for col, styp in stypes.items():
            otyp = otypes.get(col)
            if otyp is None:
                print(f"COL-MISSING {name}.{col} (spark {styp})")
                bad += 1
                continue
            allowed = OK.get(styp)
            if allowed is None:
                # complex type (array/struct): compare loosely
                continue
            if otyp not in allowed:
                print(f"TYPE-DIFF {name}.{col}: spark={styp} duckdb={otyp}")
                bad += 1
    print(f"done: {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's correctness gate: run every QUERIES[k] on
Spark and ORACLES[k] on DuckDB at sf0.01, compare row count + column names +
order-insensitive values.  Usage: python tools/check_oracle.py [key ...]"""

import math
import sys
from datetime import datetime

sys.path.insert(0, "/root/repo")

import duckdb

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    from opentelemetry_collector_spark.queries import ORACLES, QUERIES
    from opentelemetry_collector_spark.session import get_spark

    keys = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for k in keys:
        try:
            sdf = QUERIES[k](spark, SF)
            srows = sdf.collect()
            scols = sdf.columns
            # operators persist() vocab/score frames internally (documented
            # caller-owned lifetime); drop them between keys so the 110-key
            # sweep doesn't accumulate executor memory
            spark.catalog.clearCache()
        except Exception as e:
            print(f"FAIL {k}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if k not in ORACLES:
            print(f"ROWS-ONLY {k}: {len(srows)} rows")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(ORACLES[k])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {k}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        sc, sv = normalize(scols, [tuple(r) for r in srows])
        dc, dv = normalize(dcols, drows)
        if sc != dc:
            print(f"FAIL {k}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        # dtype audit (warn-only): driver may compare schemas strictly
        stypes = dict(sdf.dtypes)
        dtypes_map = {d[0]: str(d[1]) for d in res.description}
        CANON = {
            "INTEGER": "int", "BIGINT": "bigint", "DOUBLE": "double", "FLOAT": "float",
            "VARCHAR": "string", "STRING": "string", "BOOLEAN": "boolean",
            "TIMESTAMP": "timestamp_ntz", "DATETIME": "timestamp_ntz",
            "HUGEINT": "bigint", "BLOB": "binary", "DECIMAL": "double",
        }
        type_fail = False
        for c in sc:
            raw = dtypes_map.get(c, "?")
            want = CANON.get(raw, raw)
            got = stypes.get(c, "?")
            if want != got and not (want.startswith("NUMBER") or got.startswith("array")):
                print(f"  TYPE-WARN {k}.{c}: spark={got} duck={raw}")
            # The driver renders DuckDB HUGEINT (bare integer sum()) / DECIMAL
            # differently from Spark BIGINT/DOUBLE and hash-fails; our str()
            # canonicalization can't see that, so treat these as hard fails
            # (round 1 lesson: agg_counts_by_source/by_sink, mm_media_stats).
            if raw.startswith(("HUGEINT", "DECIMAL")):
                print(f"FAIL {k}: oracle column {c} is {raw} — CAST it (driver hash-fails these)")
                type_fail = True
        if type_fail:
            n_fail += 1
            continue
        if len(sv) != len(dv):
            print(f"FAIL {k}: rowcount spark={len(sv)} duck={len(dv)}")
            n_fail += 1
            continue
        if sv != dv:
            diffs = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
            print(f"FAIL {k}: values differ; first diffs:")
            for i in diffs:
                print(f"   spark {sv[i]}")
                print(f"   duck  {dv[i]}")
            n_fail += 1
            continue
        print(f"PASS {k}: {len(sv)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

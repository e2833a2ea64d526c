#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: check_correctness.py <sfDir> <verifyOutDir>

Mimics the driver: for each query in oracle_sql.json, load the Spark result
parquet and the DuckDB oracle result, sort columns by name, sort rows, and
compare cell-by-cell (exact for ints/strings, tiny epsilon report for floats
so rounding-boundary drift is visible before it becomes a hash mismatch).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata is single files; the ScaleUpTestdata corpora
        # are Spark-written directories of part files
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = sorted(spark_rel.columns)
            srel = con.sql(f"SELECT {', '.join(scols)} FROM spark_rel ORDER BY ALL")
            stypes = [str(t) for t in srel.types]
            srows = srel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            orel = con.sql(sql)
            ocols = sorted(orel.columns)
            osorted = con.sql(f"SELECT {', '.join(ocols)} FROM orel ORDER BY ALL")
            otypes = [str(t) for t in osorted.types]
            orows = osorted.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        # The driver's hash is type-sensitive: DuckDB widening (e.g. sum(BIGINT)
        # -> HUGEINT) fails the gate even when every cell value matches. Catch
        # that drift here, before the driver does.
        if stypes != otypes:
            mism = [(c, a, b) for c, a, b in zip(scols, stypes, otypes) if a != b]
            print(f"FAIL {name}: column type drift {mism} (spark vs oracle)")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            for c, (a, b) in enumerate(zip(sr, orow)):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if (math.isnan(a) and math.isnan(b)):
                        continue
                    bad = (i, scols[c], a, b)
                    break
                bad = (i, scols[c], a, b)
                break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r} ({len(srows)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows, {len(scols)} cols")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

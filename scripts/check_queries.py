"""Run selected queries() entries vs oracle_sql() at sf0.01 — the
driver's correctness gate, locally. Usage:
    python scripts/check_queries.py [q1 q2 ...]   (default: all)
"""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    from pyspark.sql import SparkSession

    names = sys.argv[1:] or list(e.queries())
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        # ~70 queries' broadcasts/checkpoint blocks accumulate in ONE
        # long-lived JVM: the 1g default heap OOM'd the serve thread
        # on query 69 of a full sweep (passes standalone)
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sorted(sdf.columns)
            srows_sorted = sorted(
                [tuple(r[c] for c in scols) for r in
                 [dict(zip(sdf.columns, t)) for t in srows]]
            )
            if name not in oracles:
                print(f"{name}: NO ORACLE, spark_rows={len(srows)}")
                continue
            cur = con.execute(oracles[name])
            ocols_raw = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ocols = sorted(ocols_raw)
            orows_sorted = sorted(
                [tuple(d[c] for c in ocols) for d in
                 [dict(zip(ocols_raw, t)) for t in orows]]
            )
            ok_rows = len(srows) == len(orows)
            ok_schema = scols == ocols
            ok_vals = srows_sorted == orows_sorted
            tag = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
            if tag == "FAIL":
                failed.append(name)
            print(f"{name}: {tag} rows={len(srows)}/{len(orows)} "
                  f"schema={ok_schema} vals={ok_vals}")
            if not ok_schema:
                print(f"  spark cols: {scols}\n  duck cols:  {ocols}")
            if ok_schema and not ok_vals:
                for a, b in zip(srows_sorted[:5], orows_sorted[:5]):
                    if a != b:
                        print(f"  spark {a}\n  duck  {b}")
        except Exception as ex:
            failed.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}")
        finally:
            # drop cached/broadcast blocks between queries — a full
            # sweep holds ~70 queries' residue in one JVM otherwise
            spark.catalog.clearCache()
    print("FAILED:" if failed else "ALL OK:", failed or len(names))
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

"""Judge-side oracle check for queries the driver never sampled."""
import datetime
import json
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "lineitem", "orders", "customer", "nation", "region", "part",
    "partsupp", "supplier", "events", "documents", "embeddings", "media",
]


def norm(v):
    # Tightened round 7 (r6 verdict item 8): no Decimal->float and no
    # round(...,6) normalization — both hid exactly the representation
    # classes the driver's exact value hash grades on (a Spark
    # DecimalType output read as "pass" here for two rounds while the
    # driver kept failing sql_pipe_syntax). Decimals stay Decimal
    # (repr keeps the scale padding); floats compare exact.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_to_set(cols, rows):
    return sorted(repr(tuple(norm(v) for v in r)) for r in rows)


def main(targets):
    from pyspark.sql import SparkSession
    from aws_lakehouse_spark.registry import load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("judge").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    import glob
    for t in TABLES:
        if glob.glob(f"{SF_DIR}/{t}*"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}*/**/*.parquet', hive_partitioning=true)"
            ) if False else None
    # simpler: parquet files may be dirs or files
    for t in TABLES:
        for pat in (f"{SF_DIR}/{t}.parquet", f"{SF_DIR}/{t}"):
            hits = glob.glob(pat)
            if hits:
                p = hits[0]
                src = f"'{p}/**/*.parquet'" if not p.endswith(".parquet") else f"'{p}'"
                try:
                    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM parquet_scan({src})")
                except Exception as e:
                    print(t, "view fail", e)
                break

    reg = load_all()
    out = {}
    for name in targets:
        spec = reg[name]
        res = {"err": None}
        try:
            df = spec.fn(spark, SF_DIR)
            cols = df.columns
            rows = df.collect()
            res["spark_rows"] = len(rows)
            if spec.oracle is None:
                res["err"] = "no_oracle"
            else:
                orows = con.execute(spec.oracle).fetchall()
                ocols = [d[0] for d in con.description]
                res["oracle_rows"] = len(orows)
                res["rows_match"] = len(rows) == len(orows)
                res["schema_match"] = [c.lower() for c in cols] == [c.lower() for c in ocols]
                res["hash_match"] = rows_to_set(cols, [tuple(r) for r in rows]) == rows_to_set(ocols, orows)
                if not res["schema_match"]:
                    res["detail"] = f"spark={cols} oracle={ocols}"
                elif not res["hash_match"]:
                    a = rows_to_set(cols, [tuple(r) for r in rows])
                    b = rows_to_set(ocols, orows)
                    diff = [x for x in a if x not in set(b)][:2] + ["---"] + [x for x in b if x not in set(a)][:2]
                    res["detail"] = diff
        except Exception as e:
            res["err"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = res
        ok = res.get("rows_match") and res.get("schema_match") and res.get("hash_match")
        print(name, "PASS" if ok else ("NO_ORACLE" if res["err"] == "no_oracle" else "FAIL"), flush=True)
        if not ok and res["err"] != "no_oracle":
            print("   ", {k: v for k, v in res.items() if k != "detail"})
            if "detail" in res:
                print("    detail:", str(res["detail"])[:500])
    json.dump(out, open("/root/repo/JUDGE_ORACLE_r2.json", "w"), indent=1, default=str)


if __name__ == "__main__":
    import json as _j
    r1 = set(_j.load(open("/root/repo/CORRECTNESS_r01.json")))
    r2 = set(_j.load(open("/root/repo/CORRECTNESS_r02.json")))
    from aws_lakehouse_spark.registry import load_all  # noqa
    # targets resolved in main after spark init; just compute names here
    import importlib
    sys.argv = sys.argv
    reg_names_targets = None
    from aws_lakehouse_spark import registry as _r
    from aws_lakehouse_spark import plans  # noqa: F401
    allnames = sorted(_r.REGISTRY)
    targets = [n for n in allnames if n not in r1 and n not in r2] + ["agg_pivot", "agg_approx_count_distinct"]
    main(targets)

"""Local mirror of the DRIVER's correctness gate, stricter than
tests/test_entry_oracle.py: the driver canonicalizes results with
pandas (columns sorted by name, then ``DataFrame.sort_values`` over all
columns, then a value hash). ``sort_values`` raises on ARRAY columns
(unhashable list) — the exact failure that cost multimodal_features /
text_hash_embedding their r06 rows. This mirror reproduces that
canonicalization so window entries are validated against the real
contract before the driver runs.

Usage: python tools/driver_mirror.py [n_entries] [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """Driver-style canonical form: (rows, sorted column names, value hash).

    Raises if a column holds unhashable values (lists) — by design, the
    driver does too.
    """
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols).reset_index(drop=True)
    cells = []
    for _, row in df.iterrows():
        for v in row:
            if isinstance(v, float):
                cells.append(f"{v + 0.0:.6f}")
            else:
                cells.append(str(v))
    h = hashlib.sha256("|".join(cells).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("driver-mirror")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    oracles = em.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = list(qs.keys())[:n]
    if only:
        names = [x for x in names if x in only]
    out = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            s_rows, s_cols, s_hash = canon(sdf)
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                d_rows, d_cols, d_hash = canon(ddf)
                out[name] = {
                    "rows_match": s_rows == d_rows,
                    "schema_match": [c.lower() for c in s_cols]
                    == [c.lower() for c in d_cols],
                    "hash_match": s_hash == d_hash,
                    "spark_rows": s_rows,
                    "oracle_rows": d_rows,
                    "err": None,
                }
            else:
                out[name] = {
                    "rows_match": s_rows >= 0,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": s_rows,
                    "err": None,
                }
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"{type(e).__name__}: {e}"[:400]}
        status = out[name]
        ok = status.get("hash_match") and status.get("rows_match")
        flag = "OK " if ok else ("err" if status.get("err") else "BAD")
        print(f"{flag} {time.time() - t0:6.1f}s {name} {'' if ok else json.dumps(status)[:300]}",
              flush=True)
    bad = {k: v for k, v in out.items() if not (v.get("hash_match") and v.get("rows_match"))}
    print(f"\n{len(out) - len(bad)}/{len(out)} green; bad: {list(bad)}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Mirrors the documented driver contract: for each query with an entry in
oracle_sql.json, run the SQL in DuckDB over the sfDir parquet tables
(registered as views by table name), then compare against the Spark
parquet dump in <verifyOutDir>/<query>/ — columns sorted by name, rows
sorted, values canonicalized (floats to 12 significant digits) before
hashing.  Prints one line per query: MATCH / MISMATCH(+reason) / ERR.
"""
import sys, os, glob, json, hashlib

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return format(v, ".12g")
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def spark_result(d):
    files = glob.glob(os.path.join(d, "*.parquet"))
    t = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(d)
    cols = list(t.column_names)
    rows = list(zip(*[t.column(c).to_pylist() for c in cols])) if cols else []
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"{name}: ERR no spark dump")
            bad += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [c[0] for c in cur.description]
            orows = cur.fetchall()
            scols, srows = spark_result(d)
            oc, orows2 = table_rows(ocols, orows)
            sc, srows2 = table_rows(scols, srows)
            if oc != sc:
                print(f"{name}: MISMATCH schema spark={sc} oracle={oc}")
                bad += 1
                continue
            if len(orows2) != len(srows2):
                print(f"{name}: MISMATCH rows spark={len(srows2)} oracle={len(orows2)}")
                bad += 1
                continue
            hs = hashlib.md5(repr(srows2).encode()).hexdigest()
            ho = hashlib.md5(repr(orows2).encode()).hexdigest()
            if hs != ho:
                diffs = [(a, b) for a, b in zip(srows2, orows2) if a != b][:3]
                print(f"{name}: MISMATCH hash ({len(srows2)} rows); first diffs: {diffs}")
                bad += 1
            else:
                print(f"{name}: MATCH ({len(srows2)} rows)")
        except Exception as e:
            print(f"{name}: ERR {type(e).__name__}: {e}")
            bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

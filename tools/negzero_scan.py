#!/usr/bin/env python3
"""Oracle-side signed-zero audit — the DuckDB twin of NegZeroSpec.

Usage: python3 tools/negzero_scan.py <sfDir> <oracleSqlJson>

Runs every oracle query from oracle_sql.json in DuckDB over the sfDir
parquet tables and scans every float64 cell (and float64 arrays) for the
-0.0 bit pattern. The driver's correctness gate hashes double BIT
PATTERNS, and DuckDB's round() preserves the zero sign that Spark's
normalizes away (the r9 q163 lesson) — so any hit here means an oracle
readout is missing its `+ 0` canonicalization and will hash-mismatch a
numerically identical Spark result. Exit 0 iff no hits.
"""
import sys, os, json
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
NEGZ = np.uint64(0x8000000000000000)


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_json))
    hits = {}
    for name, sql in sorted(oracle.items()):
        try:
            df = con.execute(sql).fetchdf()
        except Exception as e:
            hits[name] = [f"ORACLE_ERROR {str(e)[:120]}"]
            continue
        for c in df.columns:
            col = df[c]
            if col.dtype == np.float64:
                n = int((col.to_numpy().view(np.uint64) == NEGZ).sum())
                if n:
                    hits.setdefault(name, []).append(f"{c}:{n}")
            elif col.dtype == object:
                for val in col:
                    if val is not None and hasattr(val, "__len__") and \
                            not isinstance(val, (str, bytes)):
                        arr = np.asarray(val)
                        if arr.dtype == np.float64 and \
                                (arr.view(np.uint64) == NEGZ).any():
                            hits.setdefault(name, []).append(f"{c}:array")
                            break
    for k, v in sorted(hits.items()):
        print(k, ", ".join(v))
    print(f"{len(oracle) - len(hits)}/{len(oracle)} clean")
    sys.exit(0 if not hits else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate a 10x 'sf1-equivalent' documents/embeddings set from sf0.1 by
duplicate+perturb (VERDICT r2 #9): used to show the dedup/ANN scale paths
(q24/q36/q39) grow sub-quadratically. Deterministic (hash-based perturbation,
no RNG). Output goes under the repo (scaledata/), never to /root/testdata.

Usage: python3 tools/gen_scale.py [src_sf_dir] [out_dir] [factor]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

ndocs = con.execute(f"SELECT count(*), max(doc_id) FROM '{src}/documents.parquet'").fetchone()
doc_cols = [r[0] for r in con.execute(
    f"DESCRIBE SELECT * FROM '{src}/documents.parquet'").fetchall()]
print(f"documents: {ndocs[0]} rows, cols={doc_cols}")

# Replica r keeps doc_id + r*stride and appends a replica-distinct token so
# exact-dup collapse doesn't trivialize shingle/minhash work; planted
# near-dups stay near-dups within every replica.
stride = ndocs[1] + 1
other = ", ".join(c for c in doc_cols if c not in ("doc_id", "text"))
other = (", " + other) if other else ""
con.execute(f"""
  COPY (
    SELECT doc_id + r * {stride} AS doc_id,
           text || ' replica' || CAST(r AS VARCHAR) AS text{other}
    FROM '{src}/documents.parquet' CROSS JOIN range({factor}) t(r)
    ORDER BY doc_id
  ) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

nemb = con.execute(f"SELECT count(*), max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()
emb_cols = [r[0] for r in con.execute(
    f"DESCRIBE SELECT * FROM '{src}/embeddings.parquet'").fetchall()]
print(f"embeddings: {nemb[0]} rows, cols={emb_cols}")
estride = nemb[1] + 1
eother = ", ".join(c for c in emb_cols if c not in ("vec_id", "embedding"))
eother = (", " + eother) if eother else ""
# deterministic per-replica per-dim jitter in [-0.01, 0.01] — small against
# component scale (~0.125 rms for unit-ish 64-dim vectors), so replicas stay
# genuine NEAR-duplicates of their source (high cosine) while still crossing
# some hyperplane boundaries, the way real near-boilerplate data would
con.execute(f"""
  COPY (
    SELECT vec_id + r * {estride} AS vec_id,
           CAST(list_transform(embedding,
             x -> x + (CAST(hash(CAST(x * 1000 AS BIGINT) + r) % 2001 AS BIGINT) - 1000) * 0.00001)
             AS FLOAT[]) AS embedding{eother}
    FROM '{src}/embeddings.parquet' CROSS JOIN range({factor}) t(r)
    ORDER BY vec_id
  ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
print(f"wrote {out}/documents.parquet ({ndocs[0]*factor} rows) and "
      f"{out}/embeddings.parquet ({nemb[0]*factor} rows)")

"""Build a timing-representative 10x scale dir from sf0.1 (~sf1.0).

Dev tool only (not part of the engine): reproduces the scale stand-in
used for the round-6 second-pass A/B numbers in OPTIMIZATION_r06.md.
Not oracle-exact — replica texts are word-salted and replica vectors
sign-flipped so cross-replica similarity is ~0 and the near-dup
structure stays realistic instead of exploding into exact-duplicate
clusters.  Usage: python tools/make_scale_standin.py  (writes
/root/scratch/sf1x10; then SPARK_GRAFT_SF_DIR=/root/scratch/sf1x10).
"""
import duckdb, os, numpy as np, pyarrow as pa, pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/scratch/sf1x10"
os.makedirs(DST, exist_ok=True)
K = 10

con = duckdb.connect()

# documents: word-salt replicas so cross-replica Jaccard ~ 0
parts = ["SELECT doc_id, text, lang, source, n_chars FROM d"]
for k in range(1, K):
    parts.append(
        f"SELECT doc_id + {k*1_000_000} AS doc_id, "
        f"regexp_replace(text, '(\\S+)', '\\1x{k}', 'g') AS text, "
        f"lang, source, n_chars + 0 AS n_chars FROM d"
    )
con.execute(f"CREATE VIEW d AS SELECT * FROM read_parquet('{SRC}/documents.parquet')")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/documents.parquet' (FORMAT PARQUET)")
print("documents done")

# embeddings: sign-flip replicas (deterministic per replica)
tbl = pq.read_table(f"{SRC}/embeddings.parquet")
vec = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
ids = tbl.column("vec_id").to_numpy()
lab = tbl.column("label").to_numpy()
out_ids, out_vecs, out_lab = [ids], [vec], [lab]
d = vec.shape[1]
for k in range(1, K):
    rng = np.random.default_rng(1000 + k)
    s = rng.choice([-1.0, 1.0], size=d).astype(np.float32)
    out_ids.append(ids + k * 1_000_000)
    out_vecs.append(vec * s)
    out_lab.append(lab)
allv = np.vstack(out_vecs)
t = pa.table({
    "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
    "embedding": pa.array(list(allv), pa.list_(pa.float32())),
    "label": pa.array(np.concatenate(out_lab), pa.int32()),
})
pq.write_table(t, f"{DST}/embeddings.parquet")
print("embeddings done", allv.shape)

# relational tables: replicate with id/key offsets on bigint key columns
for name in ["events", "lineitem", "orders", "customer", "supplier", "part"]:
    cols = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{name}.parquet')"
    ).fetchall()
    parts = [f"SELECT * FROM read_parquet('{SRC}/{name}.parquet')"]
    for k in range(1, K):
        sel = []
        for c, typ, *_ in cols:
            if typ == "BIGINT" and (c.endswith("_id") or "key" in c.lower()):
                sel.append(f"{c} + {k*10_000_000} AS {c}")
            else:
                sel.append(c)
        parts.append(
            f"SELECT {', '.join(sel)} FROM read_parquet('{SRC}/{name}.parquet')"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)"
    )
    print(name, "done")

for name in ["nation", "region"]:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{name}.parquet')) TO '{DST}/{name}.parquet' (FORMAT PARQUET)"
    )
open(f"{DST}/_DONE", "w").write("ok")
print("all done")

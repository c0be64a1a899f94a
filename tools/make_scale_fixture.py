#!/usr/bin/env python3
"""Generate an N-times-scaled documents+embeddings fixture for scaling-curve
measurements (SCALE.md): replicate the sf base tables N times with
replica-DISJOINT content, so per-operator work scales with input size while
output DENSITY (near-dup pairs per doc, ANN neighborhood structure) stays
that of the base corpus.

Why not plain duplication: cloning a doc 10x gives it 9 jaccard~1 twins, so
pair outputs grow ~N^2 for N-times input — that measures the corpus's
duplication factor, not the engine. Instead every word in replica r > 0 is
suffixed with r (token/gram counts per doc unchanged, cross-replica gram
spaces disjoint), and every embedding in replica r > 0 gets a deterministic
per-(id, dim) jitter (pairwise structure preserved within a replica, no
exact cross-replica ties).

CAVEAT (measured in round 9): word-level disjointness does NOT imply
CHAR-SHINGLE disjointness once factor > 10 — suffix "1" is a prefix of
suffix "10", so replicas 1 and 10 of the same doc share most 5-char
shingles and land jaccard >= 0.5 (22.4M genuine near-dup pairs at 100x
vs ~25k expected from linearity). Factors <= 10 (single-char suffixes)
hold at both granularities; treat 100x minhash-family OUTPUTS as
fixture density, not engine behavior (wall clock is still a valid
stress measurement — SCALE.md round-9 notes).

Other tables are copied through unchanged so every SparkEntry query runs
against the scaled dir.

Usage: python3 tools/make_scale_fixture.py <baseSfDir> <outDir> <factor>
"""
import sys, os, shutil
import duckdb

def main(base, out, n):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    ndoc = con.execute(
        f"SELECT COUNT(*), MAX(doc_id) FROM read_parquet('{base}/documents.parquet')").fetchone()
    nemb = con.execute(
        f"SELECT COUNT(*), MAX(vec_id) FROM read_parquet('{base}/embeddings.parquet')").fetchone()
    doc_stride, emb_stride = ndoc[1] + 1, nemb[1] + 1
    con.execute(f"""
      COPY (
        SELECT doc_id + r * {doc_stride} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE array_to_string(
                 list_transform(string_split(text, ' '), w -> w || r), ' ')
               END AS text,
               lang, source, n_chars
        FROM read_parquet('{base}/documents.parquet'),
             (SELECT unnest(range({n})) AS r)
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT vec_id + r * {emb_stride} AS vec_id,
               CASE WHEN r = 0 THEN embedding ELSE CAST(list_transform(
                 list_zip(embedding, range(1, len(embedding) + 1)),
                 p -> CAST(p[1] AS FLOAT) + CAST(
                   (((vec_id * 31 + CAST(p[2] AS BIGINT) * 17 + r * 7) % 1000)
                    - 500) * 0.0001 AS FLOAT)) AS FLOAT[])
               END AS embedding,
               label
        FROM read_parquet('{base}/embeddings.parquet'),
             (SELECT unnest(range({n})) AS r)
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    # lineitem replicates with key-shifted order/part/supp ids so the
    # co-purchase graph queries (q70 pagerank, q104/q106) see N disjoint
    # copies of the base graph — N-times nodes and edges, same density.
    # Strides are PER COLUMN: one shared max would push suppkeys past
    # q70's 1e6 node-id packing boundary (its row-path guard fires).
    ok, pk, sk = con.execute(f"""SELECT MAX(l_orderkey) + 1, MAX(l_partkey) + 1,
      MAX(l_suppkey) + 1 FROM read_parquet('{base}/lineitem.parquet')""").fetchone()
    con.execute(f"""
      COPY (
        SELECT l_orderkey + r * {ok} AS l_orderkey,
               l_partkey + r * {pk} AS l_partkey,
               l_suppkey + r * {sk} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{base}/lineitem.parquet'),
             (SELECT unnest(range({n})) AS r)
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "events"]:
        src = f"{base}/{t}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, f"{out}/{t}.parquet")
    for t in ["documents", "embeddings"]:
        rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {rows} rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))

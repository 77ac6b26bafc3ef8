#!/usr/bin/env python3
"""Build the sf1 scale-probe fixture (10x sf0.1) under /tmp/sf1_probe.

Purpose (VERDICT r8 #4 / r10 #3): measure one more decade of the quadratic
guards — the sqrt(N) df cap, FastSS block bounds, prefix-filter
sum(df_prefix^2), and sum(|basket|^2) — beyond the driver-provided sf0.1.
No driver-generated sf1 exists, so this synthesizes one with the scaling
properties that matter for those guards:

- documents: 10 copies in a SHARED token space. Copy k>0 deterministically
  remaps ~20% of token occurrences (token w -> w + 'q' + copy letter when
  hash(w || copy letter) % 5 == 0). Within-copy near-dup structure is
  preserved EXACTLY (the remap is a per-copy function of the token, so two
  docs' Jaccard within a copy is unchanged); cross-copy Jaccard of the
  same doc lands ~0.47 << 0.9 (kept-set overlap ~0.64/1.36), so true-pair
  counts scale ~10x while every surviving token's df grows ~8x — the
  stop-word head gets HEAVIER, which is exactly what the df-cap guards
  must survive. Text is rebuilt as the space-joined token stream (the
  fixture corpus is already that shape); n_chars is recomputed.
- customer: 10 copies with sequential keys and generator-format names
  (Customer#%09d), extending the d=1 name graph the way a real sf1 would.
- orders/lineitem: 10 copies with shifted order keys, custkeys following
  their copied customers, part/supplier keys SHARED — baskets per part
  grow 10x, probing the sum(|basket|^2) edge build.
- remaining tables copied verbatim (not probed, present for completeness).
"""
import duckdb, os, sys, string

# args: [DST] [SRC] — SRC defaults to the driver's sf0.1; passing the
# sf1 probe as SRC builds the SECOND decade (sf10) with the same
# transforms (key strides derived from the source row counts).
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO 16")
N_DOC = con.sql(f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
N_CUST = con.sql(f"SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet'").fetchone()[0]
N_ORD = con.sql(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
print(f"src sizes: docs={N_DOC} custStride={N_CUST} ordStride={N_ORD}")

def write(name, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

copies = ", ".join(str(k) for k in range(COPIES))

write("documents", f"""
  WITH src AS (SELECT * FROM '{SRC}/documents.parquet'),
  fan AS (SELECT s.*, k FROM src s, (SELECT unnest([{copies}]) AS k)),
  perturbed AS (
    SELECT doc_id + k * {N_DOC} AS doc_id,
           CASE WHEN k = 0 THEN text ELSE
             array_to_string(list_transform(string_split(text, ' '),
               w -> CASE WHEN hash(w || chr(97 + k)) % 5 = 0
                         THEN w || 'q' || chr(97 + k) ELSE w END), ' ')
           END AS text,
           lang, source, k
    FROM fan)
  SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars
  FROM perturbed ORDER BY doc_id
""")

write("customer", f"""
  SELECT c_custkey + k * {N_CUST} AS c_custkey,
         printf('Customer#%09d', c_custkey + k * {N_CUST}) AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', (SELECT unnest([{copies}]) AS k)
  ORDER BY c_custkey
""")

write("orders", f"""
  SELECT o_orderkey + k * {N_ORD} AS o_orderkey,
         o_custkey + k * {N_CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', (SELECT unnest([{copies}]) AS k)
  ORDER BY o_orderkey
""")

write("lineitem", f"""
  SELECT l_orderkey + k * {N_ORD} AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', (SELECT unnest([{copies}]) AS k)
""")

# embeddings: 10 copies, copy k with dimensions CYCLICALLY ROTATED by k and
# a per-(copy, dim) deterministic SIGN FLIP — both transforms are
# orthogonal, so every within-copy pairwise cosine (and norm) is preserved
# EXACTLY (verified: dot(0,1) == dot(copy twin pair) to the last bit) while
# cross-copy similarity decorrelates. The ANN twin of the documents' token
# remap. NOTE (measured): at a fixed cosine threshold the PAIR DENSITY of
# this corpus is constant (~1.5e-4), so dedup_embedding's true answer grows
# ~quadratically in N by semantics — the probe measures whether the
# LSH-bucketed WORK stays subquadratic, not the answer size.
write("embeddings", f"""
  WITH src AS (SELECT * FROM '{SRC}/embeddings.parquet'),
  n AS (SELECT count(*) AS n_src FROM src)
  SELECT vec_id + k * n_src AS vec_id,
         CASE WHEN k = 0 THEN embedding
              ELSE list_transform(
                     list_concat(embedding[k + 1:], embedding[1:k]),
                     (x, i) -> CASE WHEN hash(i * 31 + k) % 2 = 0
                               THEN x ELSE -x END)
         END AS embedding,
         label
  FROM src, n, (SELECT unnest([{copies}]) AS k)
  ORDER BY vec_id
""")

for t in ["region", "nation", "part", "supplier", "events"]:
    p = f"{SRC}/{t}.parquet"
    if os.path.exists(p):
        write(t, f"SELECT * FROM '{p}'")
print("done:", DST)

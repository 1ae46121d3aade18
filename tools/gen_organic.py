#!/usr/bin/env python3
"""Generate an ORGANIC-skew sf1-scale corpus (driver-side tooling).

The planted-duplicate suites (and scale_up.py replication) preserve
duplicate structure by construction; this generator produces the skew a
raw crawl actually has, while keeping every SparkEntry oracle valid:

  - documents: zipf-distributed EXACT-duplicate groups (a boilerplate head
    group of ~800 verbatim copies, a power-law body, a long singleton
    tail) over random texts in the testdata vocabulary style, plus a few
    sub-shingle-width shorties. Group sizes stay <= 900 so planted +1e6
    copies keep equal-text groups <= 1800 < maxEqualGroup; the head group
    (1600 with planted copies) exceeds every per-row LSH band bucket cap —
    the duplicate-crowding regime. All unique texts are pairwise distinct,
    so text-equality-join oracles stay exact.
  - embeddings: 32 Gaussian clusters (sigma=0.3, 64-dim) + uniform
    outliers. Same-cluster cosine ~0.15 << 0.999, all vectors pairwise
    distinct, so identical-vector planting oracles stay exact.
  - events: zipf user activity (hot users with ~5%% of all events) and
    bursty hour-of-day arrival over the same 30-day range, ns timestamps
    like the driver's tables.
  - orders/lineitem: 10x with orderkey striding and UNCHANGED custkeys —
    every customer gets 10x orders (hot-key joins/aggs). Dimensions copied.

Deterministic (seeded). Usage: gen_organic.py SRC_SF_DIR DST_DIR
"""
import json
import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
rng = np.random.default_rng(20260812)

for f in ("region.parquet", "nation.parquet", "customer.parquet",
          "supplier.parquet", "part.parquet"):
    shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))

con = duckdb.connect()

# ---- orders / lineitem: 10x, strided orderkeys, unchanged custkeys ------
ostride = con.sql(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
con.sql(f"""COPY (
  SELECT o_orderkey + k*{ostride} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet' CROSS JOIN (SELECT unnest(range(10)) AS k)
  ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT l_orderkey + k*{ostride} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet' CROSS JOIN (SELECT unnest(range(10)) AS k)
  ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

# ---- documents: zipf exact-dup groups in the testdata vocab style -------
vocab = [r[0] for r in con.sql(
    f"""SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        FROM '{src}/documents.parquet' USING SAMPLE 500 ROWS"""
).fetchall() if r[0]]
vocab = sorted(set(vocab))[:60]
langs = ["en", "de", "zh", "fr", "es"]

N_DOCS = 50_000
sizes = [800] + [max(2, int(1500 / r)) for r in range(2, 220)]
uniq_texts, seen = [], set()
def mktext(nwords):
    while True:
        t = " ".join(rng.choice(vocab, size=nwords))
        if t not in seen:
            seen.add(t)
            return t
for s in sizes:
    uniq_texts.append((mktext(int(rng.integers(30, 60))), s))
n_so_far = sum(s for _, s in uniq_texts)
for _ in range(N_DOCS - n_so_far - 20):
    uniq_texts.append((mktext(int(rng.integers(30, 60))), 1))
for i in range(20):  # sub-shingle-width shorties (organic junk rows)
    uniq_texts.append((f"d{i}"[: 1 + i % 4], 1))

texts = [t for t, s in uniq_texts for _ in range(s)]
order = rng.permutation(len(texts))
texts = [texts[i] for i in order]
doc_ids = np.arange(len(texts), dtype=np.int64)
pq.write_table(pa.table({
    "doc_id": doc_ids,
    "text": texts,
    "lang": [langs[i % 5] for i in range(len(texts))],
    "source": [f"src{i % 20}" for i in range(len(texts))],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
}), f"{dst}/documents.parquet")

# ---- embeddings: clustered + outliers, pairwise distinct ----------------
N_VEC, DIM, N_CLUST = 20_000, 64, 32
centers = rng.standard_normal((N_CLUST, DIM)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
assign = rng.integers(0, N_CLUST, N_VEC)
vecs = centers[assign] + 0.3 * rng.standard_normal((N_VEC, DIM)).astype(np.float32)
outliers = rng.random(N_VEC) < 0.05
vecs[outliers] = rng.standard_normal((int(outliers.sum()), DIM)).astype(np.float32)
pq.write_table(pa.table({
    "vec_id": np.arange(N_VEC, dtype=np.int64),
    "embedding": pa.array(list(vecs.astype(np.float32)),
                          type=pa.list_(pa.float32())),
    "label": (assign % 10).astype(np.int32),
}), f"{dst}/embeddings.parquet")

# ---- events: zipf users, bursty hours, ns timestamps --------------------
N_EV, N_USERS = 1_000_000, 1500
uw = 1.0 / np.arange(1, N_USERS + 1) ** 1.2
uw /= uw.sum()
user_id = rng.choice(np.arange(N_USERS, dtype=np.int64), size=N_EV, p=uw)
hour_w = np.array([1, 1, 1, 1, 1, 2, 3, 5, 8, 10, 9, 8,
                   8, 9, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1], dtype=float)
hour_w /= hour_w.sum()
day = rng.integers(0, 30, N_EV)
hour = rng.choice(24, size=N_EV, p=hour_w)
within = rng.integers(0, 3600_000_000, N_EV)  # micros within the hour
base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
ts_us = (base + day * 86_400_000_000 + hour * 3_600_000_000 + within)
order = np.argsort(ts_us, kind="stable")
etypes = np.array(["view", "click", "purchase", "signup", "error"])
etype = rng.choice(etypes, size=N_EV, p=[0.5, 0.3, 0.05, 0.05, 0.1])
pq.write_table(pa.table({
    "event_id": np.arange(N_EV, dtype=np.int64),
    "ts": pa.array((ts_us[order] * 1000).astype("int64"),
                   type=pa.timestamp("ns")),
    "user_id": user_id[order],
    "event_type": etype[order],
    "value": np.round(rng.random(N_EV) * 200, 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EV)],
}), f"{dst}/events.parquet")

print(json.dumps({
    "docs": len(texts), "uniq_texts": len(uniq_texts),
    "head_group": sizes[0], "vecs": N_VEC, "events": N_EV,
    "lineitem_x": 10}))

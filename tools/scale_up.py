#!/usr/bin/env python3
"""Build a scaled-up robustness corpus from an existing sf directory.

Replicates documents/embeddings/events `factor`x with oracle-safe
transforms:
  - documents: replica k > 0 gets text || ' repK' (distinct from every
    original, so text-equality-join oracles keep describing the dup
    structure exactly: each replica carries its own organic duplicates,
    planted +1000000 copies are still the only cross-id equal texts)
  - embeddings: replica k > 0 circularly shifts the vector by k dims
    (distinct vectors, cosine far from 1; the identical-vector oracles
    recompute pair sets from content equality, so both the rotations and
    any --skew exact copies are described correctly)
  - events: replica k > 0 shifts event_id and user_id by per-column
    strides (sessions/windows never merge across replicas; timestamps
    unchanged, so hourly windows get factor-times denser — the window /
    sessionize / as-of / streaming-twin stress case)
Since generator v2 (r19, verdict #2) the RELATIONAL fact chain scales
too, so the star-join / SCD2 / window / as-of queries get a real 100x
tier instead of re-reading byte-identical tables:
  - customer: replica k shifts c_custkey by a stride SHARED with the
    events user_id domain (one id domain: the as-of joins match events
    replica k to orders replica k instead of degrading to all-null)
  - orders: replica k shifts o_orderkey by its own stride and o_custkey
    by the shared customer stride — FK structure per replica intact,
    join fan-out unchanged (pure volume), date windows factor-x denser
  - lineitem: replica k shifts l_orderkey by the orders stride;
    l_partkey / l_suppkey stay (part/supplier are DIMENSIONS — they
    don't scale with the facts, so each part/supplier key fans out
    factor-x more lineitems: the hot-dimension stress shape)
nation/region/part/supplier are copied unscaled (dimension tables).
Every oracle recomputes over the same files, so the transforms are
correctness-safe by construction; what they preserve is MEANING (join
selectivity per replica, session boundaries, planted-pair structure).

A `_scale_meta.json` sidecar records the generator version; the bench's
ensureScaled rebuilds any cached corpus whose recorded version is stale,
so a generator widening cannot silently serve an old layout.

With `--skew`, a zipf-shaped duplicate tail is appended on top of the
uniform replicas — the organic-skew stress the uniform replication
preserves away:
  - documents: hot doc r (r = 1..~50, doc_id % 101 == 0 in the base)
    gains ceil(200/r) EXACT copies (ids from 5,000,000 up, clear of the
    +1,000,000 planting offset and every replica id) — equal-text groups
    of up to 200 members exercise maxBucket/maxEqualGroup guard exactness
    (the oracle keeps every pair; any guard that silently drops one
    mismatches)
  - events: the busiest user's events are replayed 50x with fresh
    event_ids and +k-second timestamps — one hot session key
  - embeddings: vector 0 gains 100 exact copies (ids 5,000,000+) — one
    hot LSH bucket / identical-cosine clique
  - lineitem (v2): the order with the most lineitems has them replayed
    50x with fresh l_linenumbers — one hot join/groupBy key for the
    salted-agg / salted-join / q3 shapes
Oracles stay valid by construction: the DuckDB oracle recomputes on the
same files, so added duplicates are described identically on both sides.

Usage: scale_up.py SRC_SF_DIR DST_DIR FACTOR [--skew]
"""
import json
import os
import shutil
import sys

import duckdb

GENERATOR_VERSION = 2

src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
skew = "--skew" in sys.argv[4:]
SKEW_BASE = 5_000_000
os.makedirs(dst, exist_ok=True)

SCALED = ("documents.parquet", "embeddings.parquet", "events.parquet",
          "customer.parquet", "orders.parquet", "lineitem.parquet")
for f in os.listdir(src):
    if f.endswith(".parquet") and f not in SCALED:
        shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))

con = duckdb.connect()

# ONE shared stride for the customer/user id domain: events.user_id,
# customer.c_custkey, and orders.o_custkey all shift by it, so replica k
# of events still as-of-joins replica k of orders (separate strides would
# quietly turn the as-of queries into all-null matches at scale)
cust_stride = con.sql(f"""SELECT greatest(
      (SELECT max(c_custkey) FROM '{src}/customer.parquet'),
      (SELECT max(o_custkey) FROM '{src}/orders.parquet'),
      (SELECT max(user_id)   FROM '{src}/events.parquet')) + 1""").fetchone()[0]
okey_stride = con.sql(
    f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]

cust_parts = " UNION ALL ".join(
    f"""SELECT c_custkey + {k * cust_stride} AS c_custkey,
          c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet'"""
    for k in range(factor))
con.sql(f"COPY ({cust_parts}) TO '{dst}/customer.parquet' (FORMAT PARQUET)")

ord_parts = " UNION ALL ".join(
    f"""SELECT o_orderkey + {k * okey_stride} AS o_orderkey,
          o_custkey + {k * cust_stride} AS o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'"""
    for k in range(factor))
con.sql(f"COPY ({ord_parts}) TO '{dst}/orders.parquet' (FORMAT PARQUET)")

li_parts = " UNION ALL ".join(
    f"""SELECT l_orderkey + {k * okey_stride} AS l_orderkey,
          l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
          l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'"""
    for k in range(factor))
if skew:
    # one hot join/groupBy key: the order with the most lineitems has
    # them replayed 50x with fresh linenumbers (ids untouched otherwise)
    hot_order = con.sql(f"""SELECT l_orderkey FROM '{src}/lineitem.parquet'
        GROUP BY 1 ORDER BY count(*) DESC, l_orderkey LIMIT 1""").fetchone()[0]
    ln_stride = con.sql(f"""SELECT max(l_linenumber)+1
        FROM '{src}/lineitem.parquet'""").fetchone()[0]
    li_parts += f""" UNION ALL
        SELECT l_orderkey, l_partkey, l_suppkey,
          l_linenumber + CAST((c + 1) * {ln_stride} AS INT) AS l_linenumber,
          l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus, l_shipdate
        FROM (SELECT * FROM '{src}/lineitem.parquet'
              WHERE l_orderkey = {hot_order})
        CROSS JOIN (SELECT unnest(range(50)) AS c)"""
con.sql(f"COPY ({li_parts}) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)")

doc_stride = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
assert doc_stride * factor < 1_000_000, "replica ids must stay below the planting offset"
doc_parts = " UNION ALL ".join(
    f"""SELECT doc_id + {k * doc_stride} AS doc_id,
          text{f" || ' rep{k}'" if k else ""} AS text,
          lang, source,
          n_chars{f" + {len(f' rep{k}')}" if k else ""} AS n_chars
        FROM '{src}/documents.parquet'"""
    for k in range(factor))
if skew:
    # zipf tail: hot doc with rank r gets ceil(200/r) exact copies
    doc_parts += f""" UNION ALL
        SELECT {SKEW_BASE} + row_number() OVER (ORDER BY doc_id, c) AS doc_id,
          text, lang, source, n_chars
        FROM (SELECT *, row_number() OVER (ORDER BY doc_id) AS r
              FROM '{src}/documents.parquet' WHERE doc_id % 101 = 0) h
        CROSS JOIN (SELECT unnest(range(200)) AS c)
        WHERE c < CAST(ceil(200.0 / r) AS BIGINT)"""
con.sql(f"COPY ({doc_parts}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")

vec_stride = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
assert vec_stride * factor < 1_000_000
dim = con.sql(f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]
# replica k rotates by k % dim; at k >= dim the rotation repeats, so that
# band additionally NEGATES every element (cosine vs any pure rotation is
# exactly -cos; -0.0 is normalized to 0.0 so exact content-equality
# oracles see identical semantics in both engines). Caveat, disclosed
# rather than papered over: negation is the identity on an all-zero
# vector (its k and k-dim replicas coincide, growing that planted equal
# group), and a corpus pair with cos ≈ -1 makes a negated replica a
# near-duplicate of a rotated one — both harmless for the Spark↔DuckDB
# compare (both engines see the same data) but they mean planted-group
# sizes are only exact below dim bands. Past 2*dim the scheme would
# repeat wholesale — cap there.
assert factor <= 2 * dim, f"factor {factor} > 2*dim {2*dim}: replicas would repeat"


def _vec_expr(k: int) -> str:
    rot = (f"embedding[{(k % dim) + 1}:] || embedding[:{k % dim}]"
           if k % dim else "embedding")
    if k < dim:
        return f"CAST({rot} AS FLOAT[])"
    return (f"CAST(list_transform({rot}, "
            "x -> CASE WHEN x = 0 THEN CAST(0 AS FLOAT) ELSE -x END) "
            "AS FLOAT[])")


vec_parts = " UNION ALL ".join(
    f"""SELECT vec_id + {k * vec_stride} AS vec_id,
          {_vec_expr(k)} AS embedding,
          label
        FROM '{src}/embeddings.parquet'"""
    for k in range(factor))
if skew:
    vec_parts += f""" UNION ALL
        SELECT {SKEW_BASE} + c AS vec_id, embedding, label
        FROM (SELECT * FROM '{src}/embeddings.parquet' WHERE vec_id = 0)
        CROSS JOIN (SELECT unnest(range(100)) AS c)"""
con.sql(f"COPY ({vec_parts}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")

ev_stride = con.sql(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
# user_id shifts by the SHARED customer-domain stride (see cust_stride
# above): sessions still never merge across replicas (every replica's
# user ids are disjoint), and events replica k keeps matching orders
# replica k in the as-of joins
ev_parts = " UNION ALL ".join(
    f"""SELECT event_id + {k * ev_stride} AS event_id, ts,
          user_id + {k * cust_stride} AS user_id, event_type, value, props
        FROM '{src}/events.parquet'"""
    for k in range(factor))
if skew:
    hot_user = con.sql(f"""SELECT user_id FROM '{src}/events.parquet'
        GROUP BY 1 ORDER BY count(*) DESC, user_id LIMIT 1""").fetchone()[0]
    ev_parts += f""" UNION ALL
        SELECT {SKEW_BASE} + row_number() OVER (ORDER BY event_id, c) AS event_id,
          ts + to_seconds(c + 1) AS ts, user_id, event_type, value, props
        FROM (SELECT * FROM '{src}/events.parquet' WHERE user_id = {hot_user})
        CROSS JOIN (SELECT unnest(range(50)) AS c)"""
con.sql(f"COPY ({ev_parts}) TO '{dst}/events.parquet' (FORMAT PARQUET)")

# version sidecar LAST (after every COPY): a crashed build cannot leave a
# meta claiming completeness, and a cached corpus from an older generator
# is detectably stale (the bench's ensureScaled rebuilds on mismatch)
with open(os.path.join(dst, "_scale_meta.json"), "w") as f:
    json.dump({"generator_version": GENERATOR_VERSION,
               "factor": factor, "skew": skew}, f)

print(f"scaled {src} -> {dst} x{factor}{' +skew' if skew else ''}: "
      f"{doc_stride * factor} docs, {vec_stride * factor} vectors, "
      f"{factor}x events/orders/lineitem/customer")


#!/usr/bin/env python3
"""Parameterized scale-factor dataset generator (SURVEY §6).

gen_sf1.py generalized: mirrors the driver testdata's schema and
distributions (measured from /root/testdata/sf0.1) at SCALE x the
sf0.1 row counts. Deterministic (numpy seed 42). NOT the driver's
generator — representative distributions for scaling-ratio
measurement, not byte compatibility.

Usage: python3 tools/gen_sfn.py <scale-vs-sf0.1> <out-dir>
e.g.   python3 tools/gen_sfn.py 100 /root/repo/data/sf10
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALE = int(sys.argv[1])
OUT = sys.argv[2]
SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(42)

os.makedirs(OUT, exist_ok=True)

for t in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

# sf0.1 base counts x SCALE (same bases gen_sf1.py used at SCALE=10)
N_CUST, N_ORD = 15_000 * SCALE, 150_000 * SCALE
N_PART, N_SUPP = 20_000 * SCALE, 1_000 * SCALE
N_EVENTS, N_DOCS = 100_000 * SCALE, 5_000 * SCALE
N_VECS, N_USERS = 2_000 * SCALE, 1_500 * SCALE


def write(name, cols):
    pq.write_table(pa.table(cols), f"{OUT}/{name}.parquet")
    print(name, "written", flush=True)


ck = np.arange(N_CUST, dtype=np.int64)
write("customer", {
    "c_custkey": ck,
    "c_name": [f"Customer#{i:09d}" for i in ck],
    "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": rng.choice(
        ["MACHINERY", "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"], N_CUST),
})

sk = np.arange(N_SUPP, dtype=np.int64)
write("supplier", {
    "s_suppkey": sk,
    "s_name": [f"Supplier#{i:09d}" for i in sk],
    "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
    "s_acctbal": np.round(rng.uniform(0, 10000, N_SUPP), 2),
})

pk = np.arange(N_PART, dtype=np.int64)
adjectives = ["large", "hot", "blue", "small", "dark", "light", "cold", "red"]
nouns = ["ring", "bolt", "case", "drum", "plate", "wire", "tube", "disk"]
write("part", {
    "p_partkey": pk,
    "p_name": [f"{adjectives[i % 8]} {nouns[(i // 8) % 8]}" for i in pk],
    "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, N_PART)],
    "p_type": rng.choice(
        ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"], N_PART),
    "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
    "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 2),
})

ok = np.arange(N_ORD, dtype=np.int64)
d0 = np.datetime64("1995-01-01")
span_days = int((np.datetime64("2001-08-01") - d0) / np.timedelta64(1, "D"))
odate_days = rng.integers(0, span_days + 1, N_ORD)
odate = d0 + odate_days.astype("timedelta64[D]")
write("orders", {
    "o_orderkey": ok,
    "o_custkey": rng.integers(0, N_CUST, N_ORD),
    "o_orderstatus": rng.choice(["O", "P", "F"], N_ORD),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": odate.astype("datetime64[us]"),
    "o_orderpriority": rng.choice(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], N_ORD),
})

lines_per = rng.integers(1, 8, N_ORD)
l_orderkey = np.repeat(ok, lines_per)
n_li = len(l_orderkey)
l_linenumber = np.concatenate([np.arange(1, n + 1) for n in lines_per]).astype(np.int32)
ship_lag = rng.integers(1, 96, n_li)
shipdate = (d0 + np.repeat(odate_days, lines_per).astype("timedelta64[D]")
            + ship_lag.astype("timedelta64[D]"))
write("lineitem", {
    "l_orderkey": l_orderkey,
    "l_partkey": rng.integers(0, N_PART, n_li),
    "l_suppkey": rng.integers(0, N_SUPP, n_li),
    "l_linenumber": l_linenumber,
    "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
    "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
    "l_returnflag": rng.choice(["A", "N", "R"], n_li),
    "l_linestatus": rng.choice(["F", "O"], n_li),
    "l_shipdate": shipdate.astype("datetime64[us]"),
})
print("lineitem rows:", n_li, flush=True)

e0 = np.datetime64("2024-01-01T00:00:00", "us")
steps_us = rng.exponential(30 * 86400e6 / N_EVENTS, N_EVENTS)
ts = e0 + np.cumsum(steps_us).astype("timedelta64[us]")
write("events", {
    "event_id": np.arange(N_EVENTS, dtype=np.int64),
    "ts": pa.array(ts, type=pa.timestamp("us")),
    "user_id": rng.integers(0, N_USERS, N_EVENTS),
    "event_type": rng.choice(["signup", "click", "error", "view", "purchase"], N_EVENTS),
    "value": np.round(rng.exponential(50.0, N_EVENTS).clip(0, 600), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)],
})

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window"])
lengths = rng.integers(10, 101, N_DOCS)
texts = [" ".join(rng.choice(VOCAB, n)) for n in lengths]
# plant duplicates at the sf0.1 rate (8/5000)
for i in rng.choice(N_DOCS, 8 * SCALE, replace=False):
    texts[i] = texts[int(rng.integers(0, N_DOCS))]
langs = rng.choice(["en", "de", "es", "fr", "zh"], N_DOCS,
                   p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
write("documents", {
    "doc_id": np.arange(N_DOCS, dtype=np.int64),
    "text": texts,
    "lang": langs,
    "source": [f"src{i}" for i in rng.integers(0, 20, N_DOCS)],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
})

V = rng.standard_normal((N_VECS, 64)).astype(np.float32)
V /= np.linalg.norm(V, axis=1, keepdims=True)
write("embeddings", {
    "vec_id": np.arange(N_VECS, dtype=np.int64),
    "embedding": pa.array(V.tolist(), type=pa.list_(pa.float32())),
    "label": rng.integers(0, 10, N_VECS).astype(np.int32),
})
print("done ->", OUT, flush=True)

#!/usr/bin/env python3
"""Scale-factor extrapolator for the driver's synthetic testdata.

The driver's generator itself is not in the repo, so this reproduces the
OBSERVED schemas and distributions of /root/testdata/sf0.1 (seed 42,
numpy) at a larger scale factor — used for the sf1 scaling sweep in
SCALE.md. It measures SCALING (rows x10 => time x?), not oracle
exactness: values follow the same ranges/cardinalities, text follows the
same 30-word vocabulary with planted near-duplicate families, embeddings
the same 10-centroid cluster structure.

Usage: gen_sfx.py <mult> <outdir>   (mult=10 -> sf1 from sf0.1 shapes)
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"

rng = np.random.default_rng(42)
import os
os.makedirs(OUT, exist_ok=True)


def write(name, cols):
    t = pa.table(cols)
    pq.write_table(t, f"{OUT}/{name}.parquet", compression="snappy")
    print(name, t.num_rows)


# --- region / nation: fixed dimensions, copied shape -----------------
regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
write("region", {"r_regionkey": pa.array(range(5), pa.int32()),
                 "r_name": regions})
nations = [f"NATION_{i:02d}" for i in range(25)]
write("nation", {"n_nationkey": pa.array(range(25), pa.int32()),
                 "n_name": nations,
                 "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})

# --- customer / supplier / part --------------------------------------
NC = 15000 * MULT
segs = ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
write("customer", {
    "c_custkey": pa.array(np.arange(NC), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(NC)],
    "c_nationkey": pa.array(rng.integers(0, 25, NC), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, NC), 2),
    "c_mktsegment": [segs[i] for i in rng.integers(0, 5, NC)]})

NS = 1000 * MULT
write("supplier", {
    "s_suppkey": pa.array(np.arange(NS), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(NS)],
    "s_nationkey": pa.array(rng.integers(0, 25, NS), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, NS), 2)})

NP = 20000 * MULT
adjs = ["large", "hot", "small", "cold", "dim", "bright", "old", "new"]
nouns = ["ring", "bolt", "gear", "cam", "rod", "pin", "disk", "plate"]
types = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]
write("part", {
    "p_partkey": pa.array(np.arange(NP), pa.int64()),
    "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(NP)],
    "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, NP)],
    "p_type": [types[i] for i in rng.integers(0, len(types), NP)],
    "p_size": pa.array(rng.integers(1, 51, NP), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 2100, NP), 2)})

# --- orders / lineitem ------------------------------------------------
NO = 150000 * MULT
day_us = 86400_000_000
t0 = np.datetime64("1995-01-01", "us").astype(np.int64)
odate = t0 + rng.integers(0, 2404, NO) * day_us
statuses = ["O", "P", "F"]
prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
write("orders", {
    "o_orderkey": pa.array(np.arange(NO), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, NC, NO), pa.int64()),
    "o_orderstatus": [statuses[i] for i in rng.integers(0, 3, NO)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, NO), 2),
    "o_orderdate": pa.array(odate, pa.timestamp("us")),
    "o_orderpriority": [prios[i] for i in rng.integers(0, 5, NO)]})

NL = 600000 * MULT
l_orderkey = rng.integers(0, NO, NL)
l_orderkey.sort()
lship = t0 + rng.integers(1, 2500, NL) * day_us
rflags = ["R", "N", "A"]
lstat = ["O", "F"]
write("lineitem", {
    "l_orderkey": pa.array(l_orderkey, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, NP, NL), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, NS, NL), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, NL), pa.int32()),
    "l_quantity": np.round(rng.uniform(1, 50, NL), 0),
    "l_extendedprice": np.round(rng.uniform(900, 105000, NL), 2),
    "l_discount": np.round(rng.uniform(0, 0.1, NL), 2),
    "l_tax": np.round(rng.uniform(0, 0.08, NL), 2),
    "l_returnflag": [rflags[i] for i in rng.integers(0, 3, NL)],
    "l_linestatus": [lstat[i] for i in rng.integers(0, 2, NL)],
    "l_shipdate": pa.array(lship, pa.timestamp("us"))})

# --- events -----------------------------------------------------------
NE = 100000 * MULT
e0 = np.datetime64("2024-01-01", "us").astype(np.int64)
ets = e0 + rng.integers(0, 30 * day_us, NE)
ets.sort()
etypes = ["view", "click", "purchase", "signup", "error"]
write("events", {
    "event_id": pa.array(np.arange(NE), pa.int64()),
    "ts": pa.array(ets, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, 1500 * MULT, NE), pa.int64()),
    "event_type": [etypes[i] for i in rng.integers(0, 5, NE)],
    "value": np.round(rng.uniform(0, 560, NE), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, NE)]})

# --- documents: 30-word vocab, 10-100 tokens, near-dup families -------
# Optional 3rd arg: vocabulary SIZE. Default 30 reproduces the driver's
# observed corpus exactly (the hand-written word list). Any other value
# builds a Zipf(s=1.1) vocabulary of that size — real text's shape — to
# separate corpus-artifact superlinearity from algorithmic: at vocab=30
# the shingle universe caps at ~30k and every pair-similarity candidate
# filter saturates (prefix tokens are all frequent, shingles all shared);
# at a Heaps-law-realistic vocab the same queries should scale linearly.
VOCAB_N = int(sys.argv[3]) if len(sys.argv) > 3 else 30
ND = 5000 * MULT
if VOCAB_N == 30:
    vocab = np.array(["spark", "merge", "window", "customer", "part", "group",
                      "stream", "filter", "sort", "the", "scan", "vector",
                      "join", "query", "big", "hash", "data", "column", "agg",
                      "table", "line", "small", "slow", "key", "fast", "order",
                      "row", "value", "a", "batch"])
else:
    vocab = np.array([f"w{i:05d}" for i in range(VOCAB_N)])
# Zipf-weighted sampling for non-default vocabularies (rank r weight
# r^-1.1); uniform for the default 30 to preserve the observed corpus.
vocab_p = None
if VOCAB_N != 30:
    w = np.arange(1, VOCAB_N + 1, dtype=np.float64) ** -1.1
    vocab_p = w / w.sum()
langs = np.array(["en", "en", "zh", "es", "fr", "de"])  # en ~2x the rest
texts = []
doc_words = []
for i in range(ND):
    n = rng.integers(10, 101)
    words = vocab[rng.choice(len(vocab), n, p=vocab_p)] \
        if vocab_p is not None else vocab[rng.integers(0, len(vocab), n)]
    doc_words.append(words)
    texts.append(" ".join(words))
# plant near-duplicate families (~4% of docs copy an earlier doc with a
# few token mutations), mirroring the duplicate structure the dedup
# queries find at sf0.1
ndup = ND // 25
dup_targets = rng.integers(0, ND, ndup)
for j, tgt in enumerate(dup_targets):
    i = ND - ndup + j
    words = doc_words[tgt].copy()
    for _ in range(rng.integers(0, 3)):
        words[rng.integers(0, len(words))] = "dup"
    texts[i] = " ".join(words)
write("documents", {
    "doc_id": pa.array(np.arange(ND), pa.int64()),
    "text": texts,
    "lang": [langs[i] for i in rng.integers(0, len(langs), ND)],
    "source": [f"src{i}" for i in rng.integers(0, 20, ND)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())})

# --- embeddings: 64-dim, 10 label clusters ----------------------------
NV = 2000 * MULT
DIM = 64
centroids = rng.normal(0, 1, (10, DIM))
labels = rng.integers(0, 10, NV)
vecs = (centroids[labels] + rng.normal(0, 0.35, (NV, DIM))).astype(np.float32)
write("embeddings", {
    "vec_id": pa.array(np.arange(NV), pa.int64()),
    "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32())})
print("done ->", OUT)

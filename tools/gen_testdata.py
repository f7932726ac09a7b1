#!/usr/bin/env python3
"""Builder-side testdata generator for CROSS-SCALE oracle robustness
(round-9 verdict item 8). The driver's /root/testdata is read-only and
ships no generator, so this re-creates the same schemas and empirical
distributions (measured from sf0.01/sf0.1) at a new scale factor —
the point is a THIRD scale point for the scale-sensitive oracles
(band-bucket caps, watermark predicates, upsert merges, GK thresholds),
not byte-identical data.

Usage: python3 tools/gen_testdata.py <sf> <outDir>   e.g. 0.5 target/testdata/sf0.5
Deterministic: seed 42.
"""
import json
import os
import sys

import numpy as np
import pandas as pd

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = (["en"] * 40 + ["fr"] * 16 + ["es"] * 16 + ["zh"] * 14 + ["de"] * 14)
SEGMENTS = ["HOUSEHOLD", "MACHINERY", "FURNITURE", "BUILDING", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "MEDIUM", "PROMO", "STANDARD", "LARGE"]
ETYPES = ["click", "purchase", "error", "signup", "view"]


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    scale = sf / 0.1  # sizes extrapolate from the sf0.1 row counts

    def write(name, df):
        df.to_parquet(f"{out}/{name}.parquet", index=False)
        print(f"{name:12s} {len(df):>9,d} rows")

    # --- dimensions -----------------------------------------------------
    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]})
    write("region", region)
    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32)})
    write("nation", nation)

    ncust = int(15000 * scale)
    customer = pd.DataFrame({
        "c_custkey": np.arange(ncust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(ncust)],
        "c_nationkey": rng.integers(0, 25, ncust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, ncust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, ncust)})
    write("customer", customer)

    nsupp = int(1000 * scale)
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(nsupp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(nsupp)],
        "s_nationkey": rng.integers(0, 25, nsupp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, nsupp), 2)})
    write("supplier", supplier)

    npart = int(20000 * scale)
    part = pd.DataFrame({
        "p_partkey": np.arange(npart, dtype=np.int64),
        "p_name": [" ".join(rng.choice(VOCAB, 2)) for _ in range(npart)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, npart)],
        "p_type": rng.choice(PTYPES, npart),
        "p_size": rng.integers(1, 51, npart).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, npart), 2)})
    write("part", part)

    # --- facts ----------------------------------------------------------
    norders = int(150000 * scale)
    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2404, norders).astype("timedelta64[D]"))
    orders = pd.DataFrame({
        "o_orderkey": np.arange(norders, dtype=np.int64),
        "o_custkey": rng.integers(0, ncust, norders),
        "o_orderstatus": rng.choice(["P", "F", "O"], norders),
        "o_totalprice": np.round(rng.uniform(1000, 500000, norders), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": rng.choice(PRIORITIES, norders)})
    write("orders", orders)

    # ~4 lines per order (clipped Poisson, the measured shape)
    nlines = np.clip(rng.poisson(4.0, norders), 1, 13)
    okeys = np.repeat(orders.o_orderkey.values, nlines)
    linenos = np.concatenate([np.arange(1, k + 1) for k in nlines])
    nli = len(okeys)
    ship = (odate.astype("datetime64[D]").repeat(nlines) +
            rng.integers(1, 96, nli).astype("timedelta64[D]"))
    lineitem = pd.DataFrame({
        "l_orderkey": okeys.astype(np.int64),
        "l_partkey": rng.integers(0, npart, nli),
        "l_suppkey": rng.integers(0, nsupp, nli),
        "l_linenumber": linenos.astype(np.int32),
        "l_quantity": rng.integers(1, 51, nli).astype(float),
        "l_extendedprice": np.round(rng.uniform(900, 105000, nli), 2),
        "l_discount": np.round(rng.integers(0, 11, nli) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, nli) * 0.01, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], nli),
        "l_linestatus": rng.choice(["F", "O"], nli),
        "l_shipdate": ship.astype("datetime64[us]")})
    write("lineitem", lineitem)

    nev = int(100000 * scale)
    nusers = max(10, nev // 66)
    span_us = 30 * 24 * 3600 * 1_000_000
    ets = (np.datetime64("2024-01-01T00:00:00.000000") +
           np.sort(rng.integers(0, span_us, nev)).astype("timedelta64[us]"))
    events = pd.DataFrame({
        "event_id": np.arange(nev, dtype=np.int64),
        "ts": ets,
        "user_id": rng.integers(0, nusers, nev),
        "event_type": rng.choice(ETYPES, nev),
        "value": np.round(rng.uniform(0, 500, nev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, nev)]})
    write("events", events)

    # --- corpus ---------------------------------------------------------
    ndocs = int(5000 * scale)
    texts = [" ".join(rng.choice(VOCAB, rng.integers(10, 101)))
             for _ in range(ndocs)]
    # ~0.2% exact duplicates (the measured sf0.1 rate) to keep the
    # dedup operators exercised
    for i in range(500, ndocs, 500):
        texts[i] = texts[i - 37]
    documents = pd.DataFrame({
        "doc_id": np.arange(ndocs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, ndocs),
        "source": [f"src{i}" for i in rng.integers(0, 20, ndocs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})
    write("documents", documents)

    # embeddings: near-uniform unit vectors with the measured weak label
    # bias (within-label spread ~1.0, between-centroid ~0.1). Capped at
    # 2x the sf0.1 count — the O(n^2) exact-twin oracles are the gate's
    # bottleneck, and 2x is already a new scale point for them.
    nemb = min(int(2000 * scale), 4000)
    labels = rng.integers(0, 10, nemb).astype(np.int32)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    g = rng.normal(0, 1, (nemb, 64))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    v = g + 0.07 * centers[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    embeddings = pd.DataFrame({
        "vec_id": np.arange(nemb, dtype=np.int64),
        "embedding": list(v.astype(np.float32)),
        "label": labels})
    write("embeddings", embeddings)


if __name__ == "__main__":
    main()

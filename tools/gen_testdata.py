"""Local fixture generator mirroring TESTDATA.md's synthetic tables
at larger scale factors (round-7 verdict ask #2: measure — don't
argue — the scale posture beyond the driver's sf0.1 ceiling).

Mirrors the driver-generated tables' schemas, key ranges, and
distribution shapes (verified against /root/testdata/sf0.1 —
zero-truncated-Poisson lines-per-order, exponential event values,
unit-normalized 64-d embeddings, 30-word document vocabulary with
~0.16% planted exact dups, Jan-2024 event stream whose DENSITY scales
while the time span stays fixed). Seeded (42): deterministic output.

This is a SCALING fixture: distributions match in shape so plans do
the same relative work, but the exact RNG stream differs from the
driver's, so value-level oracle hashes are only meaningful against
DuckDB run on the SAME files (which tools/verify_local.py does).

Usage: python tools/gen_testdata.py <out_dir> <sf>
  sf=1.0 -> 6M lineitem / 1M events / 50k documents / 20k embeddings
Writes one parquet per table. Never writes outside <out_dir>.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["large", "hot", "blue", "old", "cold", "small", "new", "red"]
NOUNS = ["ring", "bolt", "plate", "gear", "cap", "tube", "rod", "pin"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = (["en"] * 41 + ["fr"] * 15 + ["es"] * 15 + ["de"] * 14
         + ["zh"] * 15)
VOCAB = ("batch part spark line column order small sort fast value "
         "scan a hash slow group agg filter query big key window row "
         "table stream merge data join shuffle stage plan").split()

DAY_US = 86_400_000_000


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main() -> int:
    out, sf = sys.argv[1], float(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[
            rng.integers(0, 5, n_cust)].tolist()}))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in
                   zip(rng.integers(0, len(ADJS), n_part),
                       rng.integers(0, len(NOUNS), n_part))],
        "p_brand": [f"Brand#{i}" for i in
                    rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)].tolist(),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 999.9, n_part), 2)}))

    base_1995 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate_days = rng.integers(0, 2405, n_ord)      # ..2001-08-01
    odate = base_1995 + odate_days * DAY_US
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[
            rng.integers(0, 3, n_ord)].tolist(),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[
            rng.integers(0, 5, n_ord)].tolist()}))

    # lineitem: zero-truncated Poisson lines per order (mean 4,
    # matching the sf0.1 per-order histogram)
    nlines = 1 + rng.poisson(3.0, n_ord)
    okey = np.repeat(np.arange(n_ord), nlines)
    n_li = okey.size
    lineno = np.concatenate([np.arange(1, k + 1) for k in nlines]) \
        if n_ord else np.array([], np.int64)
    shipdate = (base_1995
                + np.repeat(odate_days, nlines) * DAY_US
                + rng.integers(1, 96, n_li) * DAY_US)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lineno, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)].tolist(),
        "l_linestatus": np.array(["F", "O"])[
            rng.integers(0, 2, n_li)].tolist(),
        "l_shipdate": pa.array(shipdate, pa.timestamp("us"))}))

    # events: fixed 30-day span, density scales with sf; exponential
    # inter-arrival gaps normalized to the span, exponential values
    base_2024 = np.datetime64("2024-01-01", "us").astype(np.int64)
    gaps = rng.exponential(1.0, n_ev)
    ts = base_2024 + np.floor(
        np.cumsum(gaps) / gaps.sum() * (30 * DAY_US - 1)
    ).astype(np.int64)
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[
            rng.integers(0, 5, n_ev)].tolist(),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    # documents: 30-word vocabulary, 8..110 words, ~0.16% planted
    # exact duplicates of earlier docs
    n_words = rng.integers(8, 111, n_doc)
    texts = [" ".join(np.array(VOCAB)[
        rng.integers(0, len(VOCAB), k)]) for k in n_words]
    n_dup = max(1, n_doc // 625)
    for i, src in zip(range(n_doc - n_dup, n_doc),
                      rng.integers(0, n_doc - n_dup, n_dup)):
        texts[i] = texts[src]
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.integers(0, len(LANGS), n_doc)].tolist(),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

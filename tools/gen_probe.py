#!/usr/bin/env python3
"""Generate the 100x scale-probe tables under /tmp/probe100x.

The driver testdata tops out at sf0.1; graft.Probe runs the gated
queries against this synthetic set to check the 100x scaling story
(SURVEY.md par.6 records the numbers):

  - events:     10M rows / 50k users / 30 days, JSON props
  - embeddings: 50k x 64 float32
  - documents:  sf0.1 documents x10 with fresh doc_ids (dup-dense)

Usage: python3 tools/gen_probe.py [outdir] [sfdir]
Then:  sbt "runMain graft.Probe /tmp/probe100x q_retention q_funnel ..."
"""
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def gen_sf1(out, sfdir):
    """sf1-equivalent set: every sf0.1 table x10 with key-remapped
    replicas (joins stay consistent, results scale ~10x) written as
    MULTI-row-group parquet so scans genuinely fan out.  Usage:
      python3 tools/gen_probe.py sf1 [outdir] [sfdir]
    Then: SPARK_GRAFT_SF_DIR=<outdir> sbt "runMain graft.Bench ..."
    """
    os.makedirs(out, exist_ok=True)
    reps = 10

    def base(df, col):
        return int(df[col].max()) + 1

    def rep(df, offsets, rg, n_reps):
        # dimension tables with NO key offsets must be written once:
        # verbatim copies would duplicate join keys and explode every
        # join through them (nation/region fan out x100)
        parts = []
        for i in range(n_reps):
            p = df.copy()
            for col, b in offsets.items():
                p[col] = p[col] + i * b
            parts.append(p)
        big = pd.concat(parts, ignore_index=True)
        return big, rg

    t = {}
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        t[name] = pd.read_parquet(f"{sfdir}/{name}.parquet")
    ck, pk, sk, ok = (base(t["customer"], "c_custkey"),
                      base(t["part"], "p_partkey"),
                      base(t["supplier"], "s_suppkey"),
                      base(t["orders"], "o_orderkey"))
    ek, uk = base(t["events"], "event_id"), base(t["events"], "user_id")
    dk, vk = base(t["documents"], "doc_id"), base(t["embeddings"], "vec_id")
    plan = {
        "region": ({}, 1), "nation": ({}, 4),
        "customer": ({"c_custkey": ck}, 20_000),
        "supplier": ({"s_suppkey": sk}, 2_000),
        "part": ({"p_partkey": pk}, 25_000),
        "orders": ({"o_orderkey": ok, "o_custkey": ck}, 150_000),
        "lineitem": ({"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk},
                     500_000),
        "events": ({"event_id": ek, "user_id": uk}, 100_000),
        "documents": ({"doc_id": dk}, 5_000),
        "embeddings": ({"vec_id": vk}, 2_000),
    }
    for name, (offsets, rg) in plan.items():
        big, rg = rep(t[name], offsets, rg, 1 if not offsets else reps)
        # keep the driver set's physical types (events ts is ns)
        schema = pq.read_schema(f"{sfdir}/{name}.parquet")
        table = pa.Table.from_pandas(big, schema=schema,
                                     preserve_index=False)
        pq.write_table(table, f"{out}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {len(big)} rows, "
              f"{pq.ParquetFile(f'{out}/{name}.parquet').metadata.num_row_groups} row groups")
    print("generated sf1-equivalent set at", out)


if len(sys.argv) > 1 and sys.argv[1] == "sf1":
    gen_sf1(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1",
            sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
    sys.exit(0)

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe100x"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
rng = np.random.default_rng(42)

n = 10_000_000
users = rng.integers(0, 50_000, n)
ts = (np.datetime64("2024-01-01")
      + rng.integers(0, 30 * 86400 * 10**6, n).astype("timedelta64[us]")
      ).astype("datetime64[ns]")
types = np.array(["view", "click", "purchase", "signup", "error"])[
    rng.integers(0, 5, n)]
k = rng.integers(0, 100, n)
pq.write_table(pa.table({
    "event_id": pa.array(np.arange(n), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("ns")),
    "user_id": pa.array(users, pa.int64()),
    "event_type": pa.array(types),
    "value": pa.array(rng.random(n) * 100),
    "props": pa.array(np.char.add(np.char.add('{"k": ', k.astype(str)), "}")),
}), f"{out}/events.parquet", row_group_size=500_000)

m = 50_000
emb = (rng.random((m, 64), dtype=np.float32) - 0.5) * 2
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(m), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, m), pa.int32()),
}), f"{out}/embeddings.parquet", row_group_size=5_000)

d = pd.read_parquet(f"{sfdir}/documents.parquet")
big = pd.concat([d.assign(doc_id=d.doc_id + i * 1_000_000) for i in range(10)],
                ignore_index=True)
big.to_parquet(f"{out}/documents.parquet", row_group_size=5_000)
print("generated", out, ":", n, "events,", m, "embeddings,", len(big), "docs")

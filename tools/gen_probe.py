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

"""Deterministic scaled-SF generator for round-6 measurement (guide §1).

The driver's round-5 MEASUREMENT escalated to a driver-generated sf1.0
(1M event rows / 50k docs) that does not persist between sessions, so
optimization work needs a local stand-in at that scale. This script scales
sf0.1 by an integer factor R with the same distribution shapes:

- events / lineitem / orders / customer: R offset replicas (user/order/cust
  key spaces grow Rx, per-key row-count distributions preserved — matching a
  generator that draws iid per key);
- documents: fresh draws from the observed process (uniform words from the
  31-word vocabulary, uniform 10..100 words/doc) so similarity densities
  scale the way fresh data does rather than collapsing onto exact replicas;
- embeddings: fresh unit-norm 64-dim gaussians, labels uniform 0..9;
- nation/region/part/supplier: copied (dimension tables).

Timing stand-in ONLY: byte-level equality with the driver's sf1.0 is neither
possible nor needed (correctness is gated on the real sf0.001/0.01/0.1
oracles); what matters is matching row counts and distribution shapes so
query timings are comparable.

Usage: python bench/gen_scaled_sf.py [R] [outdir]   (default 10 /tmp/sf1x)
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _replicate(path: str, out: str, reps: int, offsets: dict[str, int]) -> None:
    t = pq.read_table(path)
    parts = []
    for r in range(reps):
        cols = []
        for name in t.schema.names:
            col = t.column(name)
            if name in offsets and r > 0:
                col = pa.chunked_array(
                    [pa.compute.add(c, offsets[name] * r) for c in col.chunks]
                )
            cols.append(col)
        parts.append(pa.table(cols, names=t.schema.names))
    pq.write_table(pa.concat_tables(parts).cast(t.schema), out)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
    import os

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(20260822)

    ev = pq.read_table(f"{SRC}/events.parquet")
    n_users = int(pa.compute.max(ev.column("user_id")).as_py()) + 1
    _replicate(
        f"{SRC}/events.parquet", f"{outdir}/events.parquet", reps,
        {"event_id": ev.num_rows, "user_id": n_users},
    )

    docs = pq.read_table(f"{SRC}/documents.parquet")
    vocab = sorted({w for s in docs.column("text").to_pylist() for w in s.split()})
    langs = sorted(set(docs.column("lang").to_pylist()))
    sources = sorted(set(docs.column("source").to_pylist()))
    n_docs = docs.num_rows * reps
    lens = rng.integers(10, 101, size=n_docs)
    words = rng.integers(0, len(vocab), size=int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(vocab[w] for w in words[pos:pos + ln]))
        pos += ln
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(
                    [langs[i] for i in rng.integers(0, len(langs), n_docs)]
                ),
                "source": pa.array(
                    [sources[i] for i in rng.integers(0, len(sources), n_docs)]
                ),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), type=pa.int64()
                ),
            }
        ),
        f"{outdir}/documents.parquet",
    )

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    n_vec = emb.num_rows * reps
    m = rng.normal(size=(n_vec, 64)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vec), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), type=pa.float32()), 64
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(
                    rng.integers(0, 10, n_vec).astype(np.int32), type=pa.int32()
                ),
            }
        ),
        f"{outdir}/embeddings.parquet",
    )

    orders = pq.read_table(f"{SRC}/orders.parquet")
    n_ord = int(pa.compute.max(orders.column("o_orderkey")).as_py()) + 1
    cust = pq.read_table(f"{SRC}/customer.parquet")
    n_cust = int(pa.compute.max(cust.column("c_custkey")).as_py()) + 1
    _replicate(
        f"{SRC}/lineitem.parquet", f"{outdir}/lineitem.parquet", reps,
        {"l_orderkey": n_ord},
    )
    _replicate(
        f"{SRC}/orders.parquet", f"{outdir}/orders.parquet", reps,
        {"o_orderkey": n_ord, "o_custkey": n_cust},
    )
    _replicate(
        f"{SRC}/customer.parquet", f"{outdir}/customer.parquet", reps,
        {"c_custkey": n_cust},
    )
    for dim in ("nation", "region", "part", "supplier"):
        pq.write_table(
            pq.read_table(f"{SRC}/{dim}.parquet"), f"{outdir}/{dim}.parquet"
        )
    print(f"wrote {outdir} at {reps}x sf0.1")


if __name__ == "__main__":
    main()

"""Scale up /root/testdata/sf0.1 to larger scale factors by deterministic
tiling — the missing order of magnitude for scale benchmarking.

The driver's generator is not available, so sfN is derived from sf0.1:

- Relational tables (customer/orders/lineitem/part/supplier) and events
  are tiled K× with per-replica key strides. Tiling preserves every value
  distribution, key skew, null pattern and correlation exactly while
  scaling key cardinalities linearly — the standard way to scale a
  benchmark fixture when the original generator is fixed-seed.
- nation/region are fixed dimensions and copied as-is.
- documents are tiled with deterministic per-replica word mutation
  (~1 in 7 words substituted, same positions for a base doc and its
  planted " dup" twin) so the WITHIN-replica near/exact-dup structure the
  sf0.1 generator planted survives verbatim, but replicas don't become
  artificial cross-replica near-duplicates that would quadratically
  explode LSH bucket sizes in a way no real corpus does.
- embeddings are tiled with small per-replica Gaussian jitter and
  re-normalized, preserving the 10-cluster structure.

Usage: python tools/gen_sf.py [--mult 10] [--out /root/repo/testdata/sf1]

Everything is seeded; re-running reproduces byte-identical tables.
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (key column -> stride) per table; stride = key-space size at sf0.1.
KEYED = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
}

EVENTS_SPAN_DAYS = 30  # sf0.1 events span 2024-01-01 .. 2024-01-31


def _tile_keyed(name: str, mult: int) -> pd.DataFrame:
    base = pq.read_table(f"{SRC}/{name}.parquet").to_pandas()
    out = []
    for i in range(mult):
        rep = base.copy()
        for col, stride in KEYED[name].items():
            rep[col] = rep[col] + i * stride
        if name == "events":
            rep["ts"] = rep["ts"] + pd.Timedelta(days=i * EVENTS_SPAN_DAYS)
        out.append(rep)
    return pd.concat(out, ignore_index=True)


def _mutate_words(text: str, replica: int, vocab: list[str]) -> str:
    words = text.split(" ")
    for j, w in enumerate(words):
        # Position-keyed (not word-keyed) so a base doc and its appended
        # " dup" twin mutate identically and stay near-duplicates.
        h = (j * 2654435761 + replica * 40503) & 0xFFFFFFFF
        if h % 7 == 0:
            words[j] = vocab[(h >> 8) % len(vocab)] + str(replica)
    return " ".join(words)


def _tile_documents(mult: int) -> pd.DataFrame:
    base = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    vocab = sorted(
        {w for t in base["text"].head(500) for w in t.split(" ")} - {"dup"}
    )
    n = len(base)
    out = [base]
    for i in range(1, mult):
        rep = base.copy()
        rep["doc_id"] = rep["doc_id"] + i * n
        rep["text"] = [_mutate_words(t, i, vocab) for t in rep["text"]]
        rep["n_chars"] = rep["text"].str.len()
        out.append(rep)
    return pd.concat(out, ignore_index=True)


def _tile_embeddings(mult: int) -> pd.DataFrame:
    base = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    n = len(base)
    mat = np.vstack(base["embedding"].to_numpy())
    out = [base]
    for i in range(1, mult):
        seed = int.from_bytes(
            hashlib.sha256(f"emb{i}".encode()).digest()[:4], "big"
        )
        rng = np.random.default_rng(seed)
        jit = mat + rng.normal(0, 0.05, mat.shape)
        jit = jit / np.linalg.norm(jit, axis=1, keepdims=True)
        rep = pd.DataFrame(
            {
                "vec_id": base["vec_id"] + i * n,
                "embedding": [row.astype(np.float32) for row in jit],
                "label": base["label"],
            }
        )
        out.append(rep)
    return pd.concat(out, ignore_index=True)


def _write(df: pd.DataFrame, path: str, like: str) -> None:
    schema = pq.read_schema(like)
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, path, compression="snappy", row_group_size=200_000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/testdata/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for name in ["region", "nation"]:
        src = f"{SRC}/{name}.parquet"
        _write(pq.read_table(src).to_pandas(), f"{args.out}/{name}.parquet", src)
        print(f"{name}: copied")
    for name in KEYED:
        df = _tile_keyed(name, args.mult)
        _write(df, f"{args.out}/{name}.parquet", f"{SRC}/{name}.parquet")
        print(f"{name}: {len(df)} rows")
    docs = _tile_documents(args.mult)
    _write(docs, f"{args.out}/documents.parquet", f"{SRC}/documents.parquet")
    print(f"documents: {len(docs)} rows")
    emb = _tile_embeddings(args.mult)
    _write(emb, f"{args.out}/embeddings.parquet", f"{SRC}/embeddings.parquet")
    print(f"embeddings: {len(emb)} rows")


if __name__ == "__main__":
    main()

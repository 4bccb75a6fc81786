#!/usr/bin/env python3
"""Synthetic embeddings fixtures for the dedup/ANN scale smoke (PLANS.md).

Generates target/scale1x and target/scale10x (2,000 / 20,000 vectors) from
ONE deterministic generator so growth exponents are measured on the same
distribution: background = iid N(0, 0.125) per dimension (matches the
harness embeddings' empirical per-dim std and near-zero means), plus 1%
planted near-dup pairs at cosine ~0.97 (the production-dedup regime; the
real fixture's 0.45-threshold pairs are just the 3.6-sigma tail of the
background, see PLANS.md round-7 note). Schema matches
/root/testdata/*/embeddings.parquet: vec_id BIGINT, embedding FLOAT[],
label INT32. Driver-side tooling only -- the library never reads this file.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

DIM = 64


def gen(n: int, out_dir: str) -> None:
    rng = np.random.default_rng(42)  # one seed per size: reproducible
    base = rng.normal(0, 0.125, size=(n, DIM)).astype(np.float32)
    planted = 0
    for i in range(0, n - 1, 100):  # 1% of vectors are a near-dup of i
        src = base[i].astype(np.float64)
        noise = rng.normal(0, 1, DIM)
        noise -= (noise @ src) / (src @ src) * src  # orthogonalize
        noise *= np.linalg.norm(src) * 0.25 / np.linalg.norm(noise)
        base[i + 1] = (src + noise).astype(np.float32)  # cos = 1/sqrt(1.0625) ~ 0.970
        planted += 1
    table = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(base), type=pa.list_(pa.float32())),
        "label": pa.array(np.arange(n, dtype=np.int64) % 10, type=pa.int32()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, f"{out_dir}/embeddings.parquet")
    print(f"{out_dir}: {n} vectors, {planted} planted near-dup pairs")


if __name__ == "__main__":
    gen(2_000, "target/scale1x")
    gen(20_000, "target/scale10x")

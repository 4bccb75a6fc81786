#!/usr/bin/env python3
"""Synthetic lineitem fixtures for the graph-family scale smoke (PLANS.md).

Generates target/gscale1x and target/gscale10x with the sf0.1 lineitem's
shape — baskets ~ 1 + Poisson(3.07) lines per order (empirical mean 4.07),
parts uniform over the catalog — at 1x (147k orders / 20k parts ≈ sf0.1)
and 10x (1.47M orders / 200k parts). BOTH axes scale 10x, matching how the
real data grows (TPC-H scales orders and parts together), so node count and
edge count grow ~10x at constant degree — the "bigger corpus" regime, not a
densification regime. One seed per size: reproducible. Only l_orderkey and
l_partkey are written (all the graph ops read). Driver-side tooling only —
the library never reads these files.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os


def gen(n_orders: int, n_parts: int, out_dir: str) -> None:
    rng = np.random.default_rng(7)
    sizes = 1 + rng.poisson(3.07, n_orders)
    orderkeys = np.repeat(np.arange(n_orders, dtype=np.int64), sizes)
    partkeys = rng.integers(0, n_parts, len(orderkeys), dtype=np.int64)
    table = pa.table({"l_orderkey": pa.array(orderkeys),
                      "l_partkey": pa.array(partkeys)})
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, f"{out_dir}/lineitem.parquet")
    print(f"{out_dir}: {len(orderkeys)} lines, {n_orders} orders, {n_parts} parts")


if __name__ == "__main__":
    gen(147_000, 20_000, "target/gscale1x")
    gen(1_470_000, 200_000, "target/gscale10x")

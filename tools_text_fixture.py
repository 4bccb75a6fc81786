#!/usr/bin/env python3
"""Synthetic documents fixtures for the text-dedup scale smoke (PLANS.md).

Generates target/tscale1x and target/tscale10x (5,000 / 50,000 docs)
matching /root/testdata/*/documents.parquet's shape: the same 31-word
template vocabulary, uniform 8-96 token lengths, 20 sources, 5 langs —
plus 2% planted near-dup pairs (a copy with up to 3 token substitutions
whose SUMMED character-level edit cost is capped at 18, so every planted
pair is PROVABLY inside the SNM lev threshold of 20 — an uncapped triple
of 8-char swaps could cost ~24 edits and quietly fall outside it (ADVICE
r8) — and shares most shingles, so every dedup family has real signal at
both scales). One deterministic generator, one seed per size, so growth
exponents are measured on the same distribution.
Driver-side tooling only — the library never reads these files.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

VOCAB = ("spark line column order small sort fast value scan a batch part "
         "query agg table hash big merge group the stream filter key join "
         "customer slow vector data window line item").split()
LANGS = ["en", "en", "en", "zh", "vi"]  # en-skewed like the harness table


def gen(n_docs: int, out_dir: str) -> None:
    rng = np.random.default_rng(11)
    texts = []
    for _ in range(n_docs):
        n_tok = rng.integers(8, 97)
        texts.append(" ".join(rng.choice(VOCAB, n_tok)))
    # plant near-dups: every 50th doc overwrites the next doc with a copy
    # of itself carrying up to 3 single-token substitutions. The summed
    # per-substitution character cost (bounded above by max(len(old),
    # len(new)), a replace-then-insert/delete alignment) is capped at 18
    # < SnmMaxLev=20, so every planted pair is provably within threshold.
    planted = 0
    for i in range(0, n_docs - 1, 50):
        toks = texts[i].split()
        budget = 18
        for p in rng.choice(len(toks), size=min(3, len(toks)), replace=False):
            new = VOCAB[rng.integers(0, len(VOCAB))]
            cost = max(len(toks[p]), len(new))
            if cost <= budget:
                toks[p] = new
                budget -= cost
        texts[i + 1] = " ".join(toks)
        planted += 1
    table = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n_docs)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, f"{out_dir}/documents.parquet")
    print(f"{out_dir}: {n_docs} docs, {planted} planted near-dup pairs")


if __name__ == "__main__":
    gen(5_000, "target/tscale1x")
    gen(50_000, "target/tscale10x")

#!/usr/bin/env python3
"""Zipf-vocabulary documents tables for scale-ratio measurement.

The driver testdata's documents table draws from a 31-word vocabulary,
which saturates the 3-gram shingle space: shingle document frequencies
grow with the corpus, so the exact n-gram-Jaccard family (pair cost
Θ(Σ min(df,cap)²)) measures super-linear there for a reason that is an
artifact of the generator, not of the operator. SURVEY §6's claim that
real (Zipfian) corpora stay near-linear was argued, not measured — this
generator produces the corpus that measures it.

Writes documents.parquet (same schema as the driver testdata) at two
sizes under /root/repo/data: zipf_sf0.1 (5k docs, matching the sf0.1
row count) and zipf_sf1 (50k docs, matching gen_sf1's 10x). Vocabulary:
50k synthetic words with Zipf(s=1.07) rank frequencies — the standard
natural-language shape — so shingle dfs are dominated by a few frequent
grams (capped by MaxShingleDf) and a long unique tail. Deterministic
(seed 7). Run `sbt "runMain graft.ScalingProbe"` afterwards for the
timings (see SURVEY §6).
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_BASE = "/root/repo/data"
VOCAB_SIZE = 50_000
ZIPF_S = 1.07
rng = np.random.default_rng(7)

# rank-frequency p(r) ∝ 1/r^s over a synthetic vocabulary. Word shapes
# (letters only, length grows slowly with rank) keep the tokenizer and
# BPE paths realistic without shipping any real corpus.
ranks = np.arange(1, VOCAB_SIZE + 1)
probs = 1.0 / ranks ** ZIPF_S
probs /= probs.sum()
letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def word(rank):
    n = 2 + int(np.log1p(rank))  # frequent words short, tail words long
    idx = []
    x = rank * 2654435761 % (2 ** 32)
    for _ in range(n):
        idx.append(x % 26)
        x = (x * 1103515245 + 12345) % (2 ** 32)
    return "".join(letters[idx])


VOCAB = np.array([word(r) for r in ranks])


def gen(name, n_docs, dup_frac=0.002):
    out = f"{OUT_BASE}/{name}"
    os.makedirs(out, exist_ok=True)
    lengths = rng.integers(10, 101, n_docs)
    choices = rng.choice(VOCAB_SIZE, size=int(lengths.sum()), p=probs)
    texts, pos = [], 0
    for n in lengths:
        texts.append(" ".join(VOCAB[choices[pos:pos + n]]))
        pos += n
    # plant near-dup pairs at the driver-testdata rate so the dedup
    # operators have non-trivial output
    for i in rng.choice(n_docs, max(int(n_docs * dup_frac), 2), replace=False):
        texts[i] = texts[int(rng.integers(0, n_docs))]
    langs = rng.choice(["en", "de", "es", "fr", "zh"], n_docs,
                       p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    pq.write_table(pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), f"{out}/documents.parquet")
    print(name, n_docs, "docs written ->", out)


gen("zipf_sf0.1", 5_000)
gen("zipf_sf1", 50_000)

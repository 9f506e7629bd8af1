#!/usr/bin/env python3
"""Offline trainer for the q_txt_classifier_trained gate.

Trains a hashing-trick linear quality classifier (perceptron) on the
sf0.01 documents fixture. Features are md5-hashed token buckets (4096 —
the same featurizer the Spark plan and the DuckDB oracle compute); the
training label is a stopword-density quality rule (keep = stopword
fraction <= 0.06, a Gopher-style repetition/quality signal), which is
linearly realizable over token counts, so the perceptron converges to a
true separator and the fixture labels are exactly known. Weights are
scaled x1000 and rounded to integers: document scores are exact integer
sums — bit-portable across engines.

Output: src/main/resources/quality_weights_4096.tsv
  line 1:  <decision threshold> (label = keep iff score >= threshold)
  line 2+: 4096 integer weights in bucket order

Usage: python3 tools/train_classifier.py [sf_dir]
"""
import hashlib, random, sys

import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_BUCKETS = 4096
STOPS = {"the", "a", "of", "to", "and", "in"}
RATIO = 0.06


def bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % N_BUCKETS


docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
data = []
for _, row in docs.iterrows():
    toks = row["text"].split(" ")
    keep = sum(t in STOPS for t in toks) / len(toks) <= RATIO
    data.append(([bucket(t) for t in toks], 1 if keep else -1))
print(f"docs={len(data)} keep={sum(1 for _, y in data if y > 0)}")

random.seed(13)
wts = [0.0] * N_BUCKETS
bias = 0.0
for epoch in range(500):
    random.shuffle(data)
    errs = 0
    for bs, y in data:
        if y * (sum(wts[b] for b in bs) + bias) <= 0:
            errs += 1
            for b in bs:
                wts[b] += y
            bias += y
    if errs == 0:
        break
print(f"perceptron converged: epochs={epoch} errors={errs}")

iw = [round(w * 1000) for w in wts]
threshold = -round(bias * 1000)  # keep iff sum(weights) >= threshold
acc = sum(1 for bs, y in data
          if (sum(iw[b] for b in bs) >= threshold) == (y > 0)) / len(data)
print(f"integer-weight training accuracy={acc:.4f} threshold={threshold}")

out = "src/main/resources/quality_weights_4096.tsv"
with open(out, "w") as f:
    f.write(f"{threshold}\n")
    f.write("\n".join(str(w) for w in iw) + "\n")
print(f"wrote {out}")

#!/usr/bin/env python
"""Measure the SUPERVISED language-ID ceiling of a documents table.

Evidence script for the q_lang_id honesty note: the driver testdata's
`lang` column is text-independent (every label draws from one shared
~31-word vocabulary), so no classifier — however good — can recover the
label from the text. This script quantifies that by training the
strongest cheap supervised baseline (word-level multinomial naive
Bayes with add-one smoothing, trained ON THE LABELS of half the
corpus) and reporting held-out per-language recall. If even the
label-supervised ceiling is near chance, any unsupervised heuristic's
low score on this corpus is data-bound, not model-bound.

Usage: python scripts/lang_ceiling.py [sf_dir]     (default sf0.01)

Observed on /root/testdata/sf0.01: macro recall ~0.21 (chance for a
5-class majority-skewed label), vocabulary 31 shared tokens.
"""

from __future__ import annotations

import math
import re
import sys
from collections import Counter

import duckdb
import numpy as np


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, lang, lower(text) t FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    langs = sorted(df["lang"].unique())
    vocab: dict[str, int] = {}
    docs = []
    for _, r in df.iterrows():
        toks = re.findall(r"[a-z0-9]+", r["t"])
        docs.append((int(r["doc_id"]), r["lang"], Counter(toks)))
        for w in toks:
            vocab.setdefault(w, len(vocab))
    train = [d for d in docs if d[0] % 2 == 0]
    test = [d for d in docs if d[0] % 2 == 1]
    counts = {l: np.ones(len(vocab)) for l in langs}
    prior: Counter = Counter()
    for _, l, c in train:
        prior[l] += 1
        for w, n in c.items():
            counts[l][vocab[w]] += n
    logp = {l: np.log(counts[l] / counts[l].sum()) for l in langs}
    logprior = {l: math.log(prior[l] / len(train)) for l in langs}
    correct: Counter = Counter()
    total: Counter = Counter()
    for _, l, c in test:
        scores = {
            ll: logprior[ll] + sum(n * logp[ll][vocab[w]] for w, n in c.items())
            for ll in langs
        }
        pred = max(scores, key=lambda k: scores[k])
        total[l] += 1
        correct[l] += int(pred == l)
    print(f"sf_dir={sf_dir}  vocab={len(vocab)} distinct tokens")
    for l in langs:
        print(f"  {l}: n={total[l]}  recall={correct[l] / max(total[l], 1):.3f}")
    macro = sum(correct[l] / max(total[l], 1) for l in langs) / len(langs)
    print(f"supervised ceiling (macro recall): {macro:.3f}")


if __name__ == "__main__":
    main()

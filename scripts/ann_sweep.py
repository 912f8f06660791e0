"""Offline ANN parameter sweep (numpy mirror of dataops LSH/IVF).

Reproduces EXACTLY the candidate-set logic of q_ann_lsh_topk /
q_ann_ivf_topk (same md5-seeded planes, same fixed centroids, same
tie-break ordering) but in-memory, so dozens of (L, k, nprobe,
n_assign) configurations can be measured in seconds instead of one
Spark run each. Output: recall@5 + mean candidate fraction per config
— the cost axis is candidates scanned, which is what a 100 TB run
pays. Used to pick the round-4 operating points recorded in BENCH.md.

Usage: python scripts/ann_sweep.py [sf_dir]
"""
import hashlib
import sys

import numpy as np
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ANN_N_QUERIES, TOPK, EMB_DIM = 5, 5, 64
IVF_CENTROID_BASE = 100

emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")[["vec_id", "embedding"]]
emb = emb.sort_values("vec_id").reset_index(drop=True)
V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
ids = emb["vec_id"].to_numpy()
n = len(ids)
Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
q_mask = ids < ANN_N_QUERIES
Q = np.flatnonzero(q_mask)

# exact top-5 per query (excluding self), tie-break asc neighbor_id
cos = Vn[Q] @ Vn.T
exact = {}
for qi, row in zip(Q, cos):
    order = np.lexsort((ids, -np.round(row, 6)))
    keep = [j for j in order if j != qi][:TOPK]
    exact[ids[qi]] = set(ids[j] for j in keep)


def planes(table, k):
    out = []
    for p in range(k):
        row = [
            1.0
            if int(hashlib.md5(f"{table}_{p}_{d}".encode()).hexdigest()[:2], 16) % 2
            else -1.0
            for d in range(EMB_DIM)
        ]
        out.append(row)
    return np.array(out)


def lsh_recall(L, k):
    P = np.concatenate([planes(t, k) for t in range(L)], axis=0).T  # 64 x L*k
    bits = (V @ P) > 0
    pow2 = 1 << np.arange(k)
    buckets = np.stack(
        [bits[:, t * k : (t + 1) * k].astype(np.int64) @ pow2 for t in range(L)],
        axis=1,
    )  # n x L
    recs, fracs = [], []
    for qi in Q:
        cand = np.zeros(n, dtype=bool)
        for t in range(L):
            cand |= buckets[:, t] == buckets[qi, t]
        cand[qi] = False
        cidx = np.flatnonzero(cand)
        fracs.append(len(cidx) / n)
        c = np.round(Vn[cidx] @ Vn[qi], 6)
        order = np.lexsort((ids[cidx], -c))[:TOPK]
        got = set(ids[cidx[j]] for j in order)
        recs.append(len(got & exact[ids[qi]]) / TOPK)
    return np.mean(recs), np.mean(fracs)


cents_idx = np.flatnonzero((ids >= IVF_CENTROID_BASE) & (ids < IVF_CENTROID_BASE + 16))
cc = Vn[cents_idx] @ Vn.T  # 16 x n centroid cosines
cent_ids = ids[cents_idx]
# rank centroids per vector: desc ccos, asc cent_id (row_number tie-break)
crank = np.lexsort((np.broadcast_to(cent_ids[:, None], cc.shape), -cc), axis=0)


def ivf_recall(nprobe, n_assign):
    assign = crank[:n_assign, :]  # n_assign x n: centroid slots per vector
    recs, fracs = [], []
    for qi in Q:
        probe = set(crank[:nprobe, qi])  # query probes its nprobe nearest
        cand = np.zeros(n, dtype=bool)
        for a in range(n_assign):
            cand |= np.isin(assign[a], list(probe))
        cand[qi] = False
        cidx = np.flatnonzero(cand)
        fracs.append(len(cidx) / n)
        c = np.round(Vn[cidx] @ Vn[qi], 6)
        order = np.lexsort((ids[cidx], -c))[:TOPK]
        got = set(ids[cidx[j]] for j in order)
        recs.append(len(got & exact[ids[qi]]) / TOPK)
    return np.mean(recs), np.mean(fracs)


print(f"n={n}  sf_dir={sf_dir}")
print("LSH  L  k   recall@5  cand_frac")
for L in (8, 16, 24, 32, 48, 64):
    for k in (3, 4, 5, 6):
        r, f = lsh_recall(L, k)
        print(f"     {L:2d}  {k}   {r:.3f}     {f:.3f}")
print("IVF  nprobe  n_assign  recall@5  cand_frac")
for na in (1, 2, 3):
    for np_ in (4, 6, 8, 10, 12):
        r, f = ivf_recall(np_, na)
        print(f"     {np_:6d}  {na:8d}  {r:.3f}     {f:.3f}")

"""Approximate-nearest-neighbor search over the `embeddings` table.

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (`ray.put` once, zero-copy read per task), per-batch
local top-k, tiny driver-side merge. The scale path is the LSH/IVF-bucketed
variant: restrict each query to its probe buckets so the matmul touches a
fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the first n vec_ids (by id)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q /= np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
    return df["vec_id"].to_numpy(), q


def _load_queries_raw(sf_dir: str, n_queries: int) -> np.ndarray:
    """Unnormalized query matrix (for sign-pattern bucketing parity with the
    SQL oracle's raw-vector dot products)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def q_ann_bruteforce(sf_dir: str, n_queries: int = 8, k: int = 5) -> pa.Table:
    """Exact cosine top-k per query (queries excluded from their own result).

    Each batch computes a (batch × queries) matmul and emits only its local
    top-k per query; the driver merges ≤ batches×k rows — no full-corpus
    materialization anywhere."""
    qids, qmat = _load_queries(sf_dir, n_queries)
    ref = ray.put((qids, qmat))

    def local_topk(t: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(ref)
        vid = t["vec_id"].to_numpy()
        m = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
        m /= np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        cos = mat_q @ m.T                       # (Q, batch)
        rows = []
        for qi in range(len(ids_q)):
            scores = cos[qi]
            mask = vid != ids_q[qi]
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            top = cand[np.argsort(-scores[cand], kind="stable")[:k]]
            rows.append(pd.DataFrame({
                "query_id": ids_q[qi], "vec_id": vid[top],
                "cos_sim": np.round(scores[top], 4)}))
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    partials = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
    df = partials.to_pandas()
    # global top-k merge; ties broken by vec_id for determinism vs the oracle
    df = df.sort_values(["query_id", "cos_sim", "vec_id"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("query_id", as_index=False).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def sql_ann_bruteforce(sf_dir: str, n_queries: int = 8, k: int = 5) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings ORDER BY vec_id LIMIT {n_queries}
), scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe, e.embedding), 4) AS cos_sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos_sim FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, vec_id) <= {k}
"""


def ann_planes_for(n_rows: int) -> int:
    """Scale-aware hyperplane count for ANN: target ~64 vectors per bucket
    (multiprobe radius 1 then touches ~(1+P)·64 candidates per query)."""
    import math
    return max(8, math.ceil(math.log2(max(n_rows, 256) / 64)))


def q_ann_lsh(sf_dir: str, n_queries: int = 8, k: int = 5,
              n_planes: int | None = None, seed: int = 5) -> pa.Table:
    """LSH-bucketed ANN (the scale path): hyperplane buckets + multiprobe
    (query bucket ± 1-bit flips). Deterministic given the seed — exactly
    mirrored by `sql_ann_lsh` (planes inlined as literals); recall is also
    measured in tests against the brute-force baseline. Buckets are computed
    from RAW vectors (sign is normalization-invariant)."""
    import pyarrow.parquet as pq

    qids, qmat = _load_queries(sf_dir, n_queries)
    t_all = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    if n_planes is None:
        n_planes = ann_planes_for(t_all.metadata.num_rows)
    first = next(t_all.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0].as_py())
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    qraw = _load_queries_raw(sf_dir, n_queries)
    qsigns = (qraw @ planes) > 0
    qbuckets = (qsigns * powers).sum(axis=1)
    probe: dict[int, set] = {}
    for qi, b in enumerate(qbuckets):
        want = {int(b)} | {int(b) ^ int(p) for p in powers}  # multiprobe radius 1
        for w in want:
            probe.setdefault(w, set()).add(qi)
    ref = ray.put((qids, qmat, probe))

    def local_topk(t: pa.Table) -> pa.Table:
        ids_q, mat_q, probe_map = ray.get(ref)
        vid = t["vec_id"].to_numpy()
        raw = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
        signs = (raw @ planes) > 0                   # bucket from RAW vector
        buckets = (signs * powers).sum(axis=1)
        m = raw / np.clip(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12, None)
        rows = []
        for b in np.unique(buckets):
            qis = probe_map.get(int(b))
            if not qis:
                continue
            sel = np.flatnonzero(buckets == b)
            sub = m[sel]
            for qi in qis:
                scores = mat_q[qi] @ sub.T
                mask = vid[sel] != ids_q[qi]
                cand = np.flatnonzero(mask)
                if not len(cand):
                    continue
                top = cand[np.argsort(-scores[cand], kind="stable")[:k]]
                rows.append(pd.DataFrame({
                    "query_id": ids_q[qi], "vec_id": vid[sel][top],
                    "cos_sim": np.round(scores[top], 4)}))
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    df = ds.map_batches(local_topk, batch_format="pyarrow",
                        batch_size=4096).to_pandas()
    if df.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cos_sim": pa.array([], pa.float64())})
    df = df.sort_values(["query_id", "cos_sim", "vec_id"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("query_id", as_index=False).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def sql_ann_lsh(sf_dir: str, n_queries: int = 8, k: int = 5) -> str:
    """DuckDB mirror of the multiprobe LSH ANN: identical seeded hyperplanes
    inlined as literals, bucket + radius-1 probe set, exact cosine top-k
    within the probed buckets (ties broken by vec_id, as the Ray side does)."""
    import pyarrow.parquet as pq

    from olrx.ops.dedup import _sql_bucket_expr

    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n_planes = ann_planes_for(f.metadata.num_rows)
    first = next(f.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0].as_py())
    planes = np.random.default_rng(5).standard_normal((dim, n_planes))
    bexpr_e = _sql_bucket_expr("embedding", planes)
    bexpr_q = _sql_bucket_expr("qe", planes)
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings ORDER BY vec_id LIMIT {n_queries}
), qb AS (
  SELECT query_id, qe, {bexpr_q} AS qbucket FROM q
), probes AS (
  SELECT query_id, qe, qbucket AS pb FROM qb
  UNION ALL
  SELECT query_id, qe, xor(qbucket, CAST(1 AS BIGINT) << j) AS pb
  FROM qb CROSS JOIN range({n_planes}) r(j)
), b AS (
  SELECT vec_id, embedding, {bexpr_e} AS bucket FROM embeddings
), cand AS (
  SELECT DISTINCT p.query_id, e.vec_id, p.qe, e.embedding
  FROM probes p JOIN b e ON e.bucket = p.pb AND e.vec_id <> p.query_id
), scored AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qe, embedding), 4) AS cos_sim
  FROM cand
)
SELECT query_id, vec_id, cos_sim FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, vec_id) <= {k}
"""

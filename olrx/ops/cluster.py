"""Distributed k-means (Lloyd's) over the embeddings table.

The canonical clustering pass of an embedding-curation pipeline (topic
bucketing, stratified sampling, IVF index training — `similarity.py`'s IVF
path uses exactly this shape with a single assignment pass). Iteration
structure is the map-reduce textbook one and every step is bounded:

- centroids are broadcast (`ray.put`, K×dim — tiny at any corpus scale);
- each batch computes its assignment with one vectorized float64 distance
  kernel and emits ≤K partial rows (cluster, n, component-sums);
- partials reduce through a `groupby(cluster)` (K groups — no skew
  possible) before the ≤K-row driver read; nothing driver-side scales
  with the corpus;
- the final pass emits (vec_id, cluster) as a streaming Dataset.

Determinism: init = the embeddings of the K smallest `vec_id`s (pruned
row-group point read, no O(N) driver scan), fixed pass count, argmin
tie-broken by smaller cluster id. The DuckDB oracle unrolls the same
passes exactly (init CTE → assignment window → per-dim AVG → assignment),
all in double precision like the kernel, so assignments compare exactly.

Reference analog: the engine's schema dictionary rebuild is a fixed-point
of apply-then-recompute passes over a broadcast map
(/root/reference/src/metadata/Schema.cpp, SURVEY §2.8); here the broadcast
state is the centroid table and the fixed pass count stands in for
convergence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from olrx.ops.similarity import _first_vectors

_K = 8
#: assignment passes (1 centroid update between them), unrolled in the oracle
_PASSES = 2


def _assign(emb: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Vectorized squared-L2 argmin in float64; ties take the smaller
    cluster id (np.argmin picks the first minimum)."""
    e = emb.astype(np.float64, copy=False)
    d = ((e[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d, axis=1).astype(np.int32)


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(t.num_rows, -1)


def q_kmeans_embed(sf_dir: str, k: int = _K, passes: int = _PASSES) -> rd.Dataset:
    """Cluster assignment per vector after ``passes`` Lloyd assignment
    passes with ``passes - 1`` mean updates between them. Output:
    (vec_id, cluster); clusters that lose all members simply stop
    appearing (the oracle's GROUP BY drops them identically)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    _, init = _first_vectors(sf_dir, k)
    cent = init.astype(np.float64)
    dim = cent.shape[1]

    for _ in range(passes - 1):
        cent_ref = ray.put(cent)
        holder: list = []

        def partials(t: pa.Table) -> pa.Table:
            if not holder:
                holder.append(ray.get(cent_ref))
            c = holder[0]
            emb = _emb_matrix(t)
            a = _assign(emb, c)
            sums = np.zeros((c.shape[0], emb.shape[1]), np.float64)
            np.add.at(sums, a, emb.astype(np.float64, copy=False))
            n = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            live = np.flatnonzero(n)
            return pa.table({
                "cluster": pa.array(live.astype(np.int32)),
                "n": pa.array(n[live], pa.int64()),
                "s": pa.array(list(sums[live]),
                              pa.list_(pa.float64(), emb.shape[1])),
            })

        def reduce_cluster(g: pa.Table) -> pa.Table:
            s = g["s"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False).reshape(g.num_rows, -1)
            return pa.table({
                "cluster": g["cluster"].slice(0, 1),
                "n": pa.array([int(pa.compute.sum(g["n"]).as_py())], pa.int64()),
                "s": pa.array([s.sum(axis=0)], pa.list_(pa.float64(), s.shape[1])),
            })

        agg = (ds.map_batches(partials, batch_format="pyarrow")
                 .groupby("cluster").map_groups(reduce_cluster,
                                                batch_format="pyarrow")
                 .take_all())
        live = sorted(agg, key=lambda r: r["cluster"])
        cent = np.stack([np.asarray(r["s"]) / r["n"] for r in live])
        cent_ids = np.array([r["cluster"] for r in live], np.int32)

    final_ref = ray.put((cent, cent_ids if passes > 1
                         else np.arange(k, dtype=np.int32)))
    holder2: list = []

    def assign_final(t: pa.Table) -> pa.Table:
        if not holder2:
            holder2.append(ray.get(final_ref))
        c, ids = holder2[0]
        a = _assign(_emb_matrix(t), c)
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": pa.array(ids[a], pa.int32())})

    return ds.map_batches(assign_final, batch_format="pyarrow")


def sql_kmeans_embed(sf_dir: str, k: int = _K) -> str:
    """Exact unrolled twin of the 2-pass default (init → assign → mean →
    assign), all-double math to match the kernel."""
    return f"""
WITH init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         embedding::DOUBLE[] AS cent
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k})
),
a1 AS (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, i.c,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_distance(e.embedding::DOUBLE[], i.cent), i.c) AS rn
    FROM embeddings e CROSS JOIN init i) WHERE rn = 1
),
dims AS (
  SELECT a1.c, generate_subscripts(e.embedding, 1) AS d,
         unnest(e.embedding::DOUBLE[]) AS v
  FROM a1 JOIN embeddings e USING (vec_id)
),
cent2 AS (
  SELECT c, list(av ORDER BY d) AS cent
  FROM (SELECT c, d, avg(v) AS av FROM dims GROUP BY c, d) GROUP BY c
)
SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM (
  SELECT e.vec_id, i.c AS cluster,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY list_distance(e.embedding::DOUBLE[], i.cent), i.c) AS rn
  FROM embeddings e CROSS JOIN cent2 i) WHERE rn = 1
"""

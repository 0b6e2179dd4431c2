"""Corpus curation operators for training-data assembly: sequence packing
and benchmark decontamination over the `documents` table.

Both are standard stages of an LLM data pipeline that sit AFTER dedup /
filtering and BEFORE tokenizer sharding:

- **sequence packing** (concat-and-chunk): documents are concatenated in a
  canonical order with one separator token each and the token stream is
  chunked into fixed-length training sequences. The operator computes each
  document's coordinates in that packed stream — a global prefix sum, the
  only non-embarrassingly-parallel step, done distributed with the
  two-pass bucket scheme (per-bucket sums → driver-side cumsum over the
  BOUNDED bucket table → broadcast offsets → per-bucket local cumsum).
  The reference analog is the confirmed-offset bookkeeping of the writer
  queue (/root/reference/src/builder/Builder.h:64-105): a totally ordered
  stream addressed by cumulative offsets, computed without materializing
  the stream.

- **decontamination**: flag training documents sharing character k-grams
  with a held-out eval/benchmark set. The benchmark side is small in every
  real deployment, so the scale shape is broadcast-small-side (`ray.put`
  the sorted eval shingle hashes once, `searchsorted` membership per
  batch) — never a shuffle join. The synthetic eval set here is the
  `doc_id % 97 == 0` stratum so the oracle is self-contained.

Exact DuckDB oracles for both (the shingle hash family is the same
seeded multiply-shift one `dedup_ngram`'s verified path uses — hash
equality == string equality up to 64-bit collisions, the precedent the
verified dedup oracles already established).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from olrx.ops.dedup import NgramShingler, _sql_shingles

# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# --------------------------------------------------------------------------

#: training sequence length (tokens per packed sequence)
_SEQ_LEN = 2048
#: driver-side bucket-offset table bound: buckets hold doc-id RANGES, so the
#: table is span/bucket_docs rows — sized so 10^10 ids stay ≤ ~40k entries
_MAX_BUCKETS = 40_000
_MIN_BUCKET_DOCS = 256


def _bucket_docs_for(span: int, cpus: int) -> int:
    """Docs per prefix-sum bucket: enough buckets to feed the pool, few
    enough that the driver's offset table stays bounded at any corpus."""
    target = max(_MIN_BUCKET_DOCS, span // max(4 * cpus, 1))
    return max(target, -(-span // _MAX_BUCKETS))


def q_sequence_pack(sf_dir: str, seq_len: int = _SEQ_LEN,
                    ds: rd.Dataset | None = None) -> rd.Dataset:
    """Packed-stream coordinates per document: documents concatenated in
    ``doc_id`` order, one separator token appended to each (cost =
    n_tokens + 1), stream chunked into ``seq_len``-token sequences.

    Output per doc: ``n_tokens`` (single-space tokenizer, exactly
    `token_vocab`'s), ``start_tok`` (global stream offset), ``seq_idx``
    (which training sequence the doc starts in), ``seq_off`` (offset
    within it). Deterministic and independent of CPU count / bucketing —
    the buckets only implement the distributed prefix sum.

    ``ds`` substitutes a pre-curated corpus Dataset of (doc_id, text);
    gaps in the id space are fine — empty buckets simply contribute zero
    to the bucket-offset table (built from the observed groupby output)."""
    import ray
    from ray.data.aggregate import Sum

    if ds is None:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # doc-id span from parquet metadata (no data read)
    import pyarrow.parquet as pq
    md = pq.read_metadata(f"{sf_dir}/documents.parquet")
    idx = md.schema.to_arrow_schema().get_field_index("doc_id")
    span = 1 + max(md.row_group(i).column(idx).statistics.max
                   for i in range(md.num_row_groups))
    bdocs = _bucket_docs_for(int(span), cpus)

    def costs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pandas().fillna("")
        # runs of non-space == non-empty single-space split segments
        ntok = texts.str.count(r"[^ ]+").to_numpy().astype(np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(ntok),
                         "cost": pa.array(ntok + 1),
                         "bucket": pa.array(ids // bdocs)})

    costed = ds.map_batches(costs, batch_format="pyarrow").materialize()
    # pass 1: per-bucket totals (combiner-pattern aggregate) → tiny table
    btab = (costed.groupby("bucket")
                  .aggregate(Sum("cost", alias_name="tot"))
                  .to_pandas().sort_values("bucket"))
    offs = np.concatenate([[0], np.cumsum(btab["tot"].to_numpy(np.int64))[:-1]])
    off_ref = ray.put((btab["bucket"].to_numpy(np.int64), offs))
    holder: list = []

    def pack_group(g: pa.Table) -> pa.Table:
        if not holder:
            holder.append(ray.get(off_ref))
        bids, boffs = holder[0]
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        cost = g["cost"].to_numpy(zero_copy_only=False)
        ntok = g["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        base = boffs[np.searchsorted(bids, ids[order[0]] // bdocs)]
        start = base + np.cumsum(cost[order]) - cost[order]
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        start = start[inv]
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "n_tokens": pa.array(ntok.astype(np.int64)),
            "start_tok": pa.array(start.astype(np.int64)),
            "seq_idx": pa.array((start // seq_len).astype(np.int64)),
            "seq_off": pa.array((start % seq_len).astype(np.int64)),
        })

    return (costed.groupby("bucket")
                  .map_groups(pack_group, batch_format="pyarrow"))


def sql_sequence_pack(sf_dir: str, seq_len: int = _SEQ_LEN) -> str:
    return f"""
WITH c AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens + 1) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM c
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // {seq_len} AS BIGINT) AS seq_idx,
       CAST(start_tok % {seq_len} AS BIGINT) AS seq_off
FROM s
"""


# --------------------------------------------------------------------------
# Decontamination (eval-set n-gram overlap)
# --------------------------------------------------------------------------

#: synthetic held-out stratum: every 97th document is "benchmark"
_EVAL_MOD = 97
#: decontamination shingle length: real pipelines match LONG n-grams
#: (short ones flag everything — k=5 marks 100% of this corpus, k=20
#: marks ~10%, measured); 20 chars ≈ a 3-4 token collision window
_DECON_K = 20


#: distinct eval-shingle cap for the broadcast path (~8 B/hash → ~40 MB on
#: the driver and per worker at the cap). Real benchmark sets sit far below
#: it; the synthetic ``doc_id % 97`` stratum is corpus-proportional, so at
#: web scale the measured count crosses the cap and the pipeline switches
#: to a distributed semi-join on ``sh`` — the same measured switch the
#: ngram df path uses (dedup._NGRAM_BCAST_VOCAB_CAP).
_DECON_BCAST_CAP = 5_000_000


def q_contamination(sf_dir: str, eval_mod: int = _EVAL_MOD,
                    k: int = _DECON_K,
                    broadcast_cap: int = _DECON_BCAST_CAP) -> pa.Table:
    """Training documents sharing ≥ 1 character k-shingle with the eval
    stratum, with the count of their distinct shingles found there.

    Path chosen by MEASURED distinct-eval-shingle count: below
    ``broadcast_cap`` the eval hash set ships once via ``ray.put`` and each
    batch probes it with one searchsorted (the shape real decontamination
    uses — benchmark sets are tiny); above the cap the eval set stays a
    distributed Dataset and training shingles semi-join it on ``sh``
    (hash shuffle), so nothing corpus-proportional ever lands on the
    driver or in a worker's broadcast heap."""
    import ray
    from ray.data.aggregate import Count

    shingler = NgramShingler(k)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def eval_hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % eval_mod == 0))
        if sub.num_rows == 0:
            return pa.table({"sh": pa.array([], pa.int64())})
        sh = shingler(sub)["sh"].to_numpy(zero_copy_only=False)
        return pa.table({"sh": pa.array(np.unique(sh))})

    # distinct eval shingles as a DATASET (per-batch unique partials →
    # one vocab-sized groupby); only its COUNT reaches the driver here
    ev_ds = (docs.map_batches(eval_hashes, batch_format="pyarrow")
                 .groupby("sh").aggregate(Count(alias_name="c"))
                 .select_columns(["sh"]).materialize())
    n_ev = ev_ds.count()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_hits": pa.array([], pa.int64())})

    if n_ev <= broadcast_cap:
        ev = np.sort(ev_ds.to_pandas()["sh"].to_numpy(np.int64)) \
            if n_ev else np.array([], np.int64)
        ev_ref = ray.put(ev)
        holder: list = []

        def flag(t: pa.Table) -> pa.Table:
            if not holder:
                holder.append(ray.get(ev_ref))
            evs = holder[0]
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            sub = t.filter(pa.array(ids % eval_mod != 0))
            if sub.num_rows == 0 or len(evs) == 0:
                return empty
            sh = shingler(sub)          # (doc_id, sh), distinct per doc
            h = sh["sh"].to_numpy(zero_copy_only=False)
            d = sh["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(evs, h)
            pos[pos == len(evs)] = len(evs) - 1
            hit = evs[pos] == h
            uids, inv = np.unique(d, return_inverse=True)
            nh = np.bincount(inv[hit], minlength=len(uids))
            keep = nh > 0
            return pa.table({"doc_id": pa.array(uids[keep].astype(np.int64)),
                             "n_hits": pa.array(nh[keep].astype(np.int64))})

        out = docs.map_batches(flag, batch_format="pyarrow")
        # zero-row Ray blocks can carry an empty schema — drop before concat
        tabs = [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
    else:
        def train_shingles(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            sub = t.filter(pa.array(ids % eval_mod != 0))
            if sub.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "sh": pa.array([], pa.int64())})
            return shingler(sub)        # (doc_id, sh), distinct per doc

        cpus = int(ray.cluster_resources().get("CPU", 8))
        tr = docs.map_batches(train_shingles, batch_format="pyarrow")
        # semi-join: training shingles are distinct per doc and the eval
        # side is globally distinct, so post-join row count per doc IS the
        # distinct-hit count — one Count aggregate, no driver materialization
        joined = tr.join(ev_ds, "inner", num_partitions=max(2, cpus),
                         on=("sh",))
        out = joined.groupby("doc_id").aggregate(Count(alias_name="n_hits"))
        tabs = [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
        tabs = [b.select(["doc_id", "n_hits"]).cast(empty.schema) for b in tabs]

    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    import pyarrow.compute as pc
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def sql_contamination(sf_dir: str, eval_mod: int = _EVAL_MOD,
                      k: int = _DECON_K) -> str:
    return f"""
WITH sh AS ({_sql_shingles(k=k)}),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {eval_mod} = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh
       WHERE doc_id % {eval_mod} <> 0)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM tr JOIN ev ON tr.g = ev.g
GROUP BY tr.doc_id
ORDER BY tr.doc_id
"""


# --------------------------------------------------------------------------
# Composed curation pipeline: quality filter → near-dup purge → packing
# --------------------------------------------------------------------------

#: quality gate: the heuristic score is 0.4·len + 0.3·punct + 0.3·stop, so
#: anything ≥ 0.95 has ALL three criteria (max partial sum is 0.7)
_QUALITY_MIN = 0.95


class QualityFilter:
    """Actor-pool filter stage: score each batch with the shared
    `QualityScore` kernel (state compiled once per worker) and pass through
    only (doc_id, text) rows at or above the threshold."""

    def __init__(self, threshold: float = _QUALITY_MIN) -> None:
        from olrx.ops.text import QualityScore
        self.scorer = QualityScore()
        self.threshold = threshold

    def __call__(self, df):
        q = self.scorer(df)["quality"].to_numpy()
        return df.loc[q >= self.threshold, ["doc_id", "text"]]


def q_curation_pipeline(sf_dir: str, quality_min: float = _QUALITY_MIN,
                        seq_len: int = _SEQ_LEN) -> rd.Dataset:
    """The flagship corpus-curation composition — the three stages every
    LLM-pretraining data pipeline chains, run as ONE streaming flow:

      1. quality gate  — `QualityScore` ≥ threshold (C4/Gopher-style rules),
         a pass-through actor-pool filter; the corpus never materializes.
      2. near-dup purge — MinHash LSH → exact-Jaccard verify → DISTRIBUTED
         connected components → keep-best representative per cluster
         (max n_chars, ties to min id); only the OUTPUT-SIZED drop set
         reaches the driver and is re-broadcast.
      3. sequence packing — survivors concatenated in doc_id order and
         chunked into `seq_len`-token training sequences via the
         distributed two-pass prefix sum.

    Output: packed-stream coordinates per SURVIVING document. Deterministic
    and independent of CPU count, so the exact composed SQL oracle
    (`sql_curation_pipeline`) hash-matches end to end.

    Scale shape: stage 1 streams; stage 2's shuffles are candidate-sized;
    stage 3 re-reads the parquet with the (corpus-small) drop/quality sets
    applied batch-side — two passes over storage total, no full-corpus
    driver materialization anywhere."""
    import ray
    from olrx.ops.dedup import minhash_verified_pairs, keep_best_plan
    from olrx.ops.cc import connected_components
    from olrx.ops.scaling import actor_pool

    def filtered() -> rd.Dataset:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        return ds.map_batches(QualityFilter, batch_format="pandas",
                              batch_size=4096, concurrency=actor_pool(),
                              fn_constructor_kwargs=dict(threshold=quality_min))

    pairs = minhash_verified_pairs(sf_dir, ds=filtered())
    members = connected_components(pairs).to_pandas()
    drop_t = keep_best_plan(sf_dir, members)
    drop = np.sort(drop_t["doc_id"].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
    drop_ref = ray.put(drop)
    holder: list = []

    def drop_filter(t: pa.Table) -> pa.Table:
        if not holder:
            holder.append(ray.get(drop_ref))
        dr = holder[0]
        if len(dr) == 0:
            return t
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dr, ids)
        pos[pos == len(dr)] = len(dr) - 1
        return t.filter(pa.array(dr[pos] != ids))

    survivors = filtered().map_batches(drop_filter, batch_format="pyarrow")
    return q_sequence_pack(sf_dir, seq_len=seq_len, ds=survivors)


def sql_curation_pipeline(sf_dir: str, quality_min: float = _QUALITY_MIN,
                          seq_len: int = _SEQ_LEN) -> str:
    """Exact composed mirror: quality CTE → filtered corpus → cluster
    closure + keep-best drop (shared CTE chain over the filtered alias) →
    windowed prefix-sum packing over the survivors."""
    from olrx.ops.dedup import _sql_cluster_ctes
    from olrx.ops.text import sql_text_quality

    quality_q = sql_text_quality(sf_dir).strip().rstrip(";")
    return f"""
WITH RECURSIVE q AS ({quality_q}),
fdocs AS (
  SELECT d.doc_id, d.text, d.n_chars
  FROM documents d JOIN q ON d.doc_id = q.doc_id
  WHERE q.quality >= {quality_min}
),
{_sql_cluster_ctes("fdocs")},
m AS (
  SELECT c.doc_id, c.cluster_id, f.n_chars
  FROM clusters c JOIN fdocs f ON f.doc_id = c.doc_id
),
ranked AS (
  SELECT doc_id, cluster_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM m
),
surv AS (
  SELECT doc_id, text FROM fdocs
  WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)
),
c AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM surv
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens + 1) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM c
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // {seq_len} AS BIGINT) AS seq_idx,
       CAST(start_tok % {seq_len} AS BIGINT) AS seq_off
FROM s
"""

"""Corpus sampling + vocabulary operators over the `documents` table.

Training-data pipelines downsample dominant strata (deterministically, so
reruns and resumes agree) and build corpus token vocabularies. Both shapes
are embarrassingly parallel at 100 TB:

- sampling is a stateless per-batch filter on a seeded hash of ``doc_id``
  — no shuffle, no coordination, resume-stable by construction (the
  reference analog is the exactly-once idempotence contract: the same
  input row always makes the same keep/drop decision);
- vocabulary counting is the combiner pattern (per-batch pre-aggregation
  → one small groupby over the distinct-token space, which grows
  sublinearly with the corpus), same as `events_topk_users`.

Both have exact DuckDB oracles: the sampling hash is a Horner polynomial
over the decimal digits of ``doc_id`` (mod 2^31-1 — the `doc_fingerprints`
hash family with a larger multiplier for short-string mixing), mirrored
digit-for-digit in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_MOD = 2_147_483_647
#: Horner multiplier: large (≫ the 10 digit values) so short decimal-digit
#: strings wrap the modulus within 2-3 digits and the mod-1000 residues come
#: out uniform (mult 31 leaves small ids striped: measured 2% keep at a
#: 200-permille rate over ids 0..499; 1000003 measures 20.2% over 100k ids)
_MULT = 1_000_003

#: per-language keep rates in permille — downsample the dominant language,
#: keep more of the rare ones (the usual data-mixing shape)
SAMPLE_RATES_PERMILLE: dict[str, int] = {
    "en": 200, "de": 400, "fr": 400, "es": 400, "zh": 600,
}
DEFAULT_RATE_PERMILLE = 300


def _digit_horner(ids: np.ndarray) -> np.ndarray:
    """Horner hash over the decimal-digit CODE POINTS of each id (exactly
    ``list_reduce`` over ``unicode()`` of ``CAST(id AS VARCHAR)`` in the SQL
    oracle). Vectorized: one numpy pass per digit position (≤ 19 for int64),
    no per-row Python."""
    ids = ids.astype(np.int64)
    nd = np.ones(len(ids), np.int64)
    tmp = ids // 10
    while (tmp > 0).any():
        nd += tmp > 0
        tmp //= 10
    h = np.zeros(len(ids), np.int64)
    for i in range(int(nd.max())):
        active = i < nd
        power = np.clip(nd - 1 - i, 0, None)
        dig = (ids // 10 ** power) % 10
        h = np.where(active, (h * _MULT + 48 + dig) % _MOD, h)
    return h


def make_sampler(rates: dict[str, int], default_rate: int):
    """Stateless `map_batches` filter: keep a row iff
    ``hash(doc_id) % 1000 < rate(lang)``."""

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_pandas().fillna("")
        rate = langs.map(lambda s: rates.get(s, default_rate)).to_numpy(np.int64)
        keep = (_digit_horner(ids) % 1000) < rate
        return batch.filter(pa.array(keep))

    return sample


def q_corpus_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic per-language stratified sample of the corpus."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"])
    return ds.map_batches(
        make_sampler(SAMPLE_RATES_PERMILLE, DEFAULT_RATE_PERMILLE),
        batch_format="pyarrow", batch_size=16384)


def sql_corpus_sample(sf_dir: str) -> str:
    cases = " ".join(f"WHEN '{lang}' THEN {rate}"
                     for lang, rate in sorted(SAMPLE_RATES_PERMILLE.items()))
    return f"""
WITH h AS (
  SELECT doc_id, lang, source,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                            x -> unicode(x))),
             (a, b) -> (a * {_MULT} + b) % {_MOD}) AS hv
  FROM documents
)
SELECT doc_id, lang, source FROM h
WHERE hv % 1000 < (CASE lang {cases} ELSE {DEFAULT_RATE_PERMILLE} END)
"""


def q_token_vocab(sf_dir: str, k: int = 100) -> pa.Table:
    """Top-k corpus vocabulary by token frequency (single-space tokenizer —
    chosen over ``\\s+`` for exact unicode-whitespace parity with the SQL
    oracle). Combiner pattern: per-batch `value_counts` partials, ONE
    groupby over the distinct-token space, sort+limit over one row per
    token."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pandas().fillna("")
        toks = texts.str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        return pa.table({"token": pa.array(vc.index.to_numpy().astype(object),
                                           pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="cnt"))
             .sort(["cnt", "token"], descending=[True, False])
             .limit(k))
    df = out.to_pandas()
    df["cnt"] = df["cnt"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def sql_token_vocab(sf_dir: str, k: int = 100) -> str:
    return f"""
SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS t FROM documents)
WHERE t <> ''
GROUP BY t ORDER BY cnt DESC, token ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

#: split bounds in percent: [0,80) train, [80,90) val, [90,100) test
_SPLIT_TRAIN = 80
_SPLIT_VAL = 90


def q_corpus_split(sf_dir: str) -> rd.Dataset:
    """Deterministic train/val/test assignment per document — the split
    every training pipeline needs to be reproducible across reruns, resumes
    and cluster sizes. Stateless per-batch map on the seeded `doc_id` hash
    (same family as `corpus_sample`): no shuffle, no coordination, and a
    document's split never depends on which worker saw it."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bucket = _digit_horner(ids) % 100
        split = np.where(bucket < _SPLIT_TRAIN, "train",
                         np.where(bucket < _SPLIT_VAL, "val", "test"))
        return pa.table({"doc_id": batch["doc_id"],
                         "lang": batch["lang"],
                         "split": pa.array(split.astype(object), pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=16384)


def sql_corpus_split(sf_dir: str) -> str:
    return f"""
WITH h AS (
  SELECT doc_id, lang,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                            x -> unicode(x))),
             (a, b) -> (a * {_MULT} + b) % {_MOD}) % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bucket < {_SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {_SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


# ---------------------------------------------------------------------------
# Exact corpus token-length quantiles (distributed value histogram)
# ---------------------------------------------------------------------------

_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_token_length_quantiles(sf_dir: str) -> pa.Table:
    """EXACT corpus quantiles of per-document token counts, without a
    global sort: token counts are small integers, so the full distribution
    compresses into a value histogram (per-batch `bincount` partials → one
    groupby over the distinct-value space, bounded by the longest document,
    not the corpus). The driver touches only the histogram — a cumsum over
    ≤ max-doc-tokens rows — and reads off lower-nearest-rank quantiles
    (smallest v with cdf(v) ≥ ⌈q·n⌉). The shape that replaces
    `ds.sort().take()` quantiles at 100 TB."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pandas().fillna("")
        ntok = texts.str.count(r"[^ ]+").to_numpy(np.int64)
        vals, cnts = np.unique(ntok, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("v").aggregate(Sum("n", alias_name="cnt"))
              .to_pandas().sort_values("v"))
    cdf = hist["cnt"].to_numpy(np.int64).cumsum()
    vals = hist["v"].to_numpy(np.int64)
    total = int(cdf[-1]) if len(cdf) else 0
    out_q, out_v = [], []
    for q in _QUANTILES:
        rank = max(int(np.ceil(q * total)), 1)
        out_q.append(q)
        out_v.append(int(vals[np.searchsorted(cdf, rank)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def sql_token_length_quantiles(sf_dir: str) -> str:
    qvals = ", ".join(f"({q})" for q in _QUANTILES)
    return f"""
WITH c AS (
  SELECT CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x <> '')) AS BIGINT) AS v
  FROM documents
),
h AS (SELECT v, count(*) AS cnt FROM c GROUP BY v),
cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cdf FROM h),
n AS (SELECT count(*) AS tot FROM c)
SELECT CAST(qs.q AS DOUBLE) AS q, CAST(min(cum.v) AS BIGINT) AS value
FROM (VALUES {qvals}) qs(q), cum, n
WHERE cum.cdf >= greatest(CAST(ceil(qs.q * n.tot) AS BIGINT), 1)
GROUP BY qs.q
"""

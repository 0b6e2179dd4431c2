"""Corpus-level rollups over the `documents` table (training-data ops).

Two operators a web-scale curation pipeline runs constantly:

- ``tfidf_sources``: the top-k characteristic terms of every source
  (domain) by TF-IDF — the standard "what is this crawl slice about"
  signal used for source-level inclusion decisions. Distributed end to
  end: per-batch (source, token) partials → ONE groupby over the
  vocab×sources space → token-grouped df attach → source-grouped top-k.
  Nothing corpus-sized ever lands on the driver; the final result is
  sources × k rows.
- ``source_stats``: per-source doc/token/char counts, quality-gate pass
  counts and language spread — the per-domain scorecard that decides
  which sources feed the training mix (reference analog: per-table
  metrics counters, rophy/OpenLogReplicator src/replicator/Replicator.cpp
  metrics surface; here lifted to the curation domain).

IDF is the fixed-point surrogate ``⌊10⁶·N/df⌋`` (monotone in 1/df)
instead of ``ln(N/df)`` so scores are pure int64 arithmetic — exactly
reproducible across this engine and the DuckDB oracle with no libm
1-ulp hazard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from olrx.ops.text import _LANG_STOPWORDS

#: terms kept per source
_TFIDF_TOPK = 5
#: fixed-point idf scale
_IDF_SCALE = 1_000_000
#: quality-gate threshold shared with the curation pipeline family
_GOOD_QUALITY = 0.7


def _token_partial(t: pa.Table) -> pa.Table:
    """Per-batch (source, token) partials: term count ``tf`` and
    docs-containing count ``nd``. Each input row is one whole document, so
    the within-batch distinct (doc, token) count is globally exact — ``nd``
    summed over batches IS the per-source document frequency (explode /
    groupby are pandas C kernels; no per-row Python)."""
    df = t.select(["doc_id", "source", "text"]).to_pandas()
    ex = df.assign(token=df["text"].fillna("").str.split(" ")) \
           .explode("token")[["doc_id", "source", "token"]]
    ex = ex[ex["token"].notna() & (ex["token"] != "")]
    g = ex.groupby(["source", "token"], sort=False) \
          .agg(tf=("doc_id", "size"), nd=("doc_id", "nunique")).reset_index()
    return pa.table({
        "source": pa.array(g["source"], pa.string()),
        "token": pa.array(g["token"], pa.string()),
        "tf": pa.array(g["tf"].to_numpy(np.int64)),
        "nd": pa.array(g["nd"].to_numpy(np.int64)),
    })


def q_tfidf_sources(sf_dir: str, topk: int = _TFIDF_TOPK) -> pa.Table:
    """Top-k TF-IDF terms per source.

    Every document belongs to exactly one source, so the global document
    frequency of a token is the SUM of its per-source ``nd`` partials —
    the df attach is a vocab-keyed groupby, not a second scan. Pipeline:
    partials → groupby(source, token) → coarse-bucketed df attach →
    coarse-bucketed per-source top-k. Both map_groups stages run on COARSE
    hash buckets (all keys of a bucket handled by one vectorized pandas
    groupby inside the UDF), never one Python call per token/source — the
    per-fine-key form costs a pandas round-trip per key (measured 27 s for
    ~80k keys vs ~1 s coarse, see olrx/ops/scaling.py). All exchanges move
    vocab-scale rows of ~40 B; the driver sees only sources × k rows."""
    from ray.data.aggregate import Sum

    from olrx.ops.scaling import coarse_buckets

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    n_docs = ds.count()
    ncb = coarse_buckets()

    agg = (ds.map_batches(_token_partial, batch_format="pyarrow")
             .groupby(["source", "token"])
             .aggregate(Sum("tf", alias_name="tf"),
                        Sum("nd", alias_name="nd")))

    def _bucket_col(s: pd.Series) -> np.ndarray:
        return (pd.util.hash_array(s.to_numpy(object)) %
                np.uint64(ncb)).astype(np.int32)

    def with_tok_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(b=_bucket_col(df["token"]))

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        df_tok = g.groupby("token")["nd"].transform("sum").to_numpy(np.int64)
        idf = (np.int64(n_docs) * np.int64(_IDF_SCALE)) // df_tok
        out = g[["source", "token"]].copy()
        out["tf"] = g["tf"].to_numpy(np.int64)
        out["df"] = df_tok
        out["score"] = g["tf"].to_numpy(np.int64) * idf
        return out

    def with_src_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(b=_bucket_col(df["source"]))

    def top_terms(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "token"], ascending=[False, True])
        g = g.groupby("source", sort=False).head(topk).copy()
        g["rank"] = g.groupby("source", sort=False).cumcount() + 1
        return g.drop(columns=["b"])

    out = (agg.map_batches(with_tok_bucket, batch_format="pandas")
              .groupby("b").map_groups(attach_df)
              .map_batches(with_src_bucket, batch_format="pandas")
              .groupby("b").map_groups(top_terms))
    df = out.to_pandas()  # sources × k rows — output-sized
    for c in ("tf", "df", "score", "rank"):
        df[c] = df[c].astype(np.int64)
    return pa.Table.from_pandas(
        df.sort_values(["source", "rank"]).reset_index(drop=True),
        preserve_index=False)


def sql_tfidf_sources(sf_dir: str, topk: int = _TFIDF_TOPK) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(string_split(coalesce(text, ''), ' ')) AS token
  FROM documents
), tf AS (
  SELECT source, token, count(*) AS tf, count(DISTINCT doc_id) AS nd
  FROM tok WHERE token <> '' GROUP BY source, token
), df AS (
  SELECT token, sum(nd) AS df FROM tf GROUP BY token
), n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.source, tf.token, CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         CAST(tf.tf * ((n.n * {_IDF_SCALE}) // df.df) AS BIGINT) AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT source, token, tf, df, score, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY score DESC, token ASC) AS rnk
      FROM scored)
WHERE rnk <= {topk}
"""


def _source_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch per-source partial counters. Quality reuses the exact
    QualityScore kernel, so the >= 0.7 gate sees `text_quality`'s
    oracle-verified values bit for bit."""
    from olrx.ops.text import QualityScore

    quality = QualityScore()(df[["doc_id", "text"]])["quality"].to_numpy()
    texts = df["text"].fillna("").reset_index(drop=True)
    ex = texts.str.split(" ").explode()
    keep = ex.notna() & (ex != "")
    n_tok = np.zeros(len(df), np.int64)
    if keep.any():
        g = ex[keep].groupby(level=0).size()  # positional index after reset
        n_tok[g.index.to_numpy()] = g.to_numpy()
    work = pd.DataFrame({
        "source": df["source"].to_numpy(),
        "n_docs": np.ones(len(df), np.int64),
        "n_good": (quality >= _GOOD_QUALITY).astype(np.int64),
        "total_tokens": n_tok,
        "total_chars": texts.str.len().to_numpy(np.int64),
    })
    return work.groupby("source", sort=False).sum().reset_index()


def q_source_stats(sf_dir: str) -> pa.Table:
    """Per-source curation scorecard: doc / quality-pass / token / char
    counts + distinct-language spread. Combiner pattern throughout (the
    partials are already source-keyed single rows per batch); the
    distinct-lang leg pre-distincts (source, lang) pairs per batch before
    its groupby so the exchange moves ≤ sources×langs rows. The final
    merge of the two source-keyed results happens on the driver because
    both are output-sized (#sources rows)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text", "lang"])

    counts = (ds.map_batches(_source_partial, batch_format="pandas")
                .groupby("source")
                .aggregate(Sum("n_docs", alias_name="n_docs"),
                           Sum("n_good", alias_name="n_good"),
                           Sum("total_tokens", alias_name="total_tokens"),
                           Sum("total_chars", alias_name="total_chars")))

    def lang_pairs(t: pa.Table) -> pa.Table:
        df = t.select(["source", "lang"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Count
    langs = (ds.map_batches(lang_pairs, batch_format="pyarrow")
               .groupby(["source", "lang"]).aggregate(Count(alias_name="c"))
               .groupby("source").aggregate(Count(alias_name="n_langs")))

    a = counts.to_pandas()
    b = langs.to_pandas()
    out = a.merge(b, on="source").sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "n_good", "total_tokens", "total_chars", "n_langs"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def sql_source_stats(sf_dir: str) -> str:
    stops = sorted(frozenset().union(*_LANG_STOPWORDS.values()))
    stop_list = ", ".join(f"'{w}'" for w in stops)
    return rf"""
WITH w AS (
  SELECT source, lang, coalesce(text, '') AS text,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+') AS words
  FROM documents
), q AS (
  SELECT source, lang, text, round(
      0.4 * CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
    + 0.3 * CASE WHEN len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                      / greatest(length(text), 1) < 0.3 THEN 1.0 ELSE 0.0 END
    + 0.3 * CASE WHEN len(list_filter(words, x -> list_contains([{stop_list}], x)))
                      * 1.0 / greatest(len(words), 1) > 0.05 THEN 1.0 ELSE 0.0 END
  , 9) AS quality FROM w
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN quality >= {_GOOD_QUALITY} THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM q GROUP BY source
"""

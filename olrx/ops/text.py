"""Text-analysis operators over the `documents` table (training-data ops).

All stages are vectorized `map_batches` transforms; the ones that need
compiled state (regexes, stopword tables) are callable classes usable as
actor pools — state built once per worker (`__init__`), applied per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# small per-language stopword lists for the n-gram/stopword language heuristic
_LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that was for on are with as".split()),
    "de": frozenset("der die und das ist ich nicht du sie wir ein eine zu den".split()),
    "fr": frozenset("le la les et de un une est je tu il nous vous dans pour".split()),
    "es": frozenset("el la los las y de un una es en que no por con para".split()),
}


class TextStats:
    """Token / char / punctuation / stopword statistics per document.

    Stateful stage pattern: regexes compiled once per worker. Works as both
    a plain fn (task pool) and a class (actor pool)."""

    def __init__(self) -> None:
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        # BPE-ish token heuristic: word pieces + punctuation runs
        self.tok_re = re.compile(r"[\w']+|[^\w\s]", re.UNICODE)
        self.punct_re = re.compile(r"[^\w\s]", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pandas().fillna("")
        ws_tokens = texts.str.split().str.len().fillna(0).astype(np.int64)
        bpe_tokens = texts.str.count(self.tok_re).astype(np.int64)
        n_chars = texts.str.len().astype(np.int64)
        n_punct = texts.str.count(self.punct_re).astype(np.int64)
        out = batch.select(["doc_id"])
        out = out.append_column("n_tokens", pa.array(ws_tokens, pa.int64()))
        out = out.append_column("n_bpe_tokens", pa.array(bpe_tokens, pa.int64()))
        out = out.append_column("n_chars_calc", pa.array(n_chars, pa.int64()))
        out = out.append_column("punct_ratio", pa.array(
            (n_punct / n_chars.clip(lower=1)).round(9), pa.float64()))
        return out


class QualityScore:
    """Heuristic document quality in [0, 1]: length band + punctuation sanity
    + stopword presence (the C4/Gopher-style rule family, simplified)."""

    def __init__(self) -> None:
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.all_stops = frozenset().union(*_LANG_STOPWORDS.values())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        words = texts.str.lower().str.findall(self.word_re)
        n_words = words.str.len().clip(lower=1)
        stop_frac = words.map(lambda ws: sum(w in self.all_stops for w in ws)) / n_words
        n_chars = texts.str.len()
        len_score = ((n_chars >= 50) & (n_chars <= 20_000)).astype(float)
        punct = texts.str.count(r"[^\w\s]") / n_chars.clip(lower=1)
        punct_score = (punct < 0.3).astype(float)
        stop_score = (stop_frac > 0.05).astype(float)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "quality": (0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score).round(9),
        })


class LangId:
    """Stopword-vote language heuristic (public fastText-style fallback)."""

    def __init__(self) -> None:
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.langs = list(_LANG_STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").str.lower()
        words = texts.str.findall(self.word_re)

        def vote(ws: list) -> str:
            best, best_n = "und", 0
            s = set(ws)
            for lang in self.langs:
                n = len(s & _LANG_STOPWORDS[lang])
                if n > best_n:
                    best, best_n = lang, n
            return best

        return pd.DataFrame({"doc_id": df["doc_id"],
                             "lang_pred": words.map(vote)})


def fingerprints(batch: pa.Table, window: int = 64) -> pa.Table:
    """Document fingerprint: full-content FNV-1a hash + a winnowed rolling
    hash (min hash over character windows) for containment checks."""
    texts = batch["text"].to_pandas().fillna("")
    full = pd.util.hash_array(texts.to_numpy(dtype=object)).astype(np.uint64)
    mins = np.empty(len(texts), np.uint64)
    for i, t in enumerate(texts):
        b = t.encode("utf-8", "ignore")
        if len(b) <= window:
            mins[i] = full[i]
            continue
        arr = np.frombuffer(b, np.uint8).astype(np.uint64)
        # rolling polynomial hash over fixed windows, vectorized via cumsum trick
        weights = np.arange(1, window + 1, dtype=np.uint64)
        view = np.lib.stride_tricks.sliding_window_view(arr, window)[::window // 2]
        mins[i] = (view * weights).sum(axis=1).min()
    return pa.table({
        "doc_id": batch["doc_id"],
        "fp_full": pa.array(full.astype(np.int64) if False else full, pa.uint64()),
        "fp_min": pa.array(mins, pa.uint64()),
    })


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_text_stats(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TextStats, batch_format="pyarrow", batch_size=8192,
                          concurrency=2)


def sql_text_stats(sf_dir: str) -> str:
    return r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[\w'']+|[^\w\s]')) AS n_bpe_tokens,
       length(text) AS n_chars_calc,
       round(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
             / greatest(length(text), 1), 9) AS punct_ratio
FROM documents
"""


def sql_text_quality(sf_dir: str) -> str:
    stops = sorted(frozenset().union(*_LANG_STOPWORDS.values()))
    stop_list = ", ".join(f"'{w}'" for w in stops)
    return rf"""
WITH w AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '[a-z'']+') AS words
  FROM documents
)
SELECT doc_id, round(
    0.4 * CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
  + 0.3 * CASE WHEN len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                    / greatest(length(text), 1) < 0.3 THEN 1.0 ELSE 0.0 END
  + 0.3 * CASE WHEN len(list_filter(words, x -> list_contains([{stop_list}], x)))
                    * 1.0 / greatest(len(words), 1) > 0.05 THEN 1.0 ELSE 0.0 END
, 9) AS quality
FROM w
"""


def q_text_quality(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(QualityScore, batch_format="pandas", batch_size=4096,
                          concurrency=2)


def q_lang_id(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas", batch_size=4096,
                          concurrency=2)


def q_fingerprints(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprints, batch_format="pyarrow", batch_size=8192)

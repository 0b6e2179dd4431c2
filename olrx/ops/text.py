"""Text-analysis operators over the `documents` table (training-data ops).

All stages are vectorized `map_batches` transforms; the ones that need
compiled state (regexes, stopword tables) are callable classes usable as
actor pools — state built once per worker (`__init__`), applied per batch.
"""

from __future__ import annotations

from olrx.ops.scaling import actor_pool

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


def _stopword_hits(words: pd.Series, stops: frozenset, distinct: bool,
                   index_len: int) -> np.ndarray:
    """Vectorized per-row stopword-hit counts for a Series of word lists:
    explode → isin → groupby-sum. No per-row Python lambda — the explode /
    isin / groupby path is all pandas C kernels."""
    ex = words.reset_index(drop=True).explode().dropna()
    if distinct and len(ex):
        ex = ex.to_frame("w").reset_index().drop_duplicates()["w"] \
               .set_axis(ex.to_frame("w").reset_index().drop_duplicates()["index"])
    hits = ex[ex.isin(stops)]
    counts = np.zeros(index_len, np.int64)
    if len(hits):
        g = hits.groupby(level=0).size()
        counts[g.index.to_numpy()] = g.to_numpy()
    return counts


class QualityScore:
    """Heuristic document quality in [0, 1]: length band + punctuation sanity
    + stopword presence (the C4/Gopher-style rule family, simplified)."""

    def __init__(self) -> None:
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.all_stops = frozenset().union(*_LANG_STOPWORDS.values())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        words = texts.str.lower().str.findall(self.word_re)
        n_words = words.str.len().clip(lower=1).to_numpy()
        n_stop = _stopword_hits(words, self.all_stops, distinct=False,
                                index_len=len(df))
        stop_frac = n_stop / n_words
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
    """Stopword-vote language heuristic (public fastText-style fallback).

    Tokenization is deliberately the ASCII class ``[a-z0-9_']+`` (not ``\\w``)
    so the DuckDB oracle's RE2 (ASCII ``\\w``) splits text identically; the
    stopword lists are pure-ASCII so non-ASCII tokens can never vote anyway.
    Vote: per language, count DISTINCT words present in its stoplist; winner
    is the first language (fixed order en,de,fr,es) attaining the max count;
    ``und`` when no stopword hits at all."""

    LANGS = ("en", "de", "fr", "es")

    def __init__(self) -> None:
        self.word_re = re.compile(r"[a-z0-9_']+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").str.lower()
        words = texts.str.findall(self.word_re)
        n = len(df)
        # one explode + drop_duplicates, then per-lang isin/groupby — all
        # pandas C kernels, no per-row Python vote loop
        ex = words.reset_index(drop=True).explode().dropna() \
                  .to_frame("w").reset_index().drop_duplicates()
        counts = np.zeros((n, len(self.LANGS)), np.int64)
        for li, lang in enumerate(self.LANGS):
            hit = ex[ex["w"].isin(_LANG_STOPWORDS[lang])]
            if len(hit):
                g = hit.groupby("index").size()
                counts[g.index.to_numpy(), li] = g.to_numpy()
        best = counts.argmax(axis=1)            # ties → first lang in order
        pred = np.asarray(self.LANGS, dtype=object)[best]
        pred[counts.max(axis=1) == 0] = "und"
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "lang_pred": pred})


def sql_lang_id(sf_dir: str) -> str:
    """DuckDB mirror of LangId: distinct-word stoplist counts + the ordered
    argmax tie-break (first language in en,de,fr,es order wins a tie)."""
    def cnt(lang: str) -> str:
        wl = ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))
        return (f"len(list_filter(words, x -> list_contains([{wl}], x))) AS {lang}")
    return rf"""
WITH w AS (
  SELECT doc_id,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS words
  FROM documents
), c AS (
  SELECT doc_id, {cnt('en')}, {cnt('de')}, {cnt('fr')}, {cnt('es')} FROM w
)
SELECT doc_id,
       CASE WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
            WHEN en >= de AND en >= fr AND en >= es THEN 'en'
            WHEN de >= fr AND de >= es THEN 'de'
            WHEN fr >= es THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM c
"""


_FP_MOD = np.uint64(2147483647)   # 2^31 - 1: keeps every product in uint64
_FP_MULT = 31
_FP_WINDOW = 64                   # winnowing window (code points)
_FP_STEP = 32


def _poly_pows(n: int) -> np.ndarray:
    """31^k mod p for k in [0, n) — cached per process."""
    global _POW_CACHE
    try:
        if len(_POW_CACHE) >= n:
            return _POW_CACHE[:n]
    except NameError:
        pass
    p = np.empty(max(n, 1024), np.uint64)
    p[0] = 1
    for i in range(1, len(p)):
        p[i] = (p[i - 1] * np.uint64(_FP_MULT)) % _FP_MOD
    _POW_CACHE = p
    return p[:n]


def _inv_pows(n: int) -> np.ndarray:
    """31^-k mod p for k in [0, n) — cached per process."""
    global _INV_CACHE
    try:
        if len(_INV_CACHE) >= n:
            return _INV_CACHE[:n]
    except NameError:
        pass
    inv = pow(_FP_MULT, int(_FP_MOD) - 2, int(_FP_MOD))
    p = np.empty(max(n, 1024), np.uint64)
    p[0] = 1
    for i in range(1, len(p)):
        p[i] = (p[i - 1] * np.uint64(inv)) % _FP_MOD
    _INV_CACHE = p
    return p[:n]


def poly_hash_strings(arr: np.ndarray, mult: int = _FP_MULT) -> np.ndarray:
    """Vectorized Horner polynomial hash (mod 2^31-1) over the code points of
    each string in an object array — the SQL-mirrorable hash shared by
    fingerprints and simhash. One concatenated code-point array + reduceat;
    no per-string Python loop. ``mult`` selects the hash family (31 default;
    simhash combines two families for a 62-bit signature)."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    lens = np.fromiter((len(s) for s in arr), np.int64, n)
    joined = "".join(arr.tolist())
    if not joined:
        return np.zeros(n, np.uint64)
    cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(np.uint64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    maxlen = int(lens.max())
    if mult == _FP_MULT:
        pows = _poly_pows(maxlen)
    else:
        pows = np.empty(maxlen, np.uint64)
        if maxlen:
            pows[0] = 1
        for i in range(1, maxlen):
            pows[i] = (pows[i - 1] * np.uint64(mult)) % _FP_MOD
    doc_of = np.repeat(np.arange(n), lens)
    pos_in = np.arange(len(cp)) - offs[:-1][doc_of]
    terms = (cp * pows[lens[doc_of] - 1 - pos_in]) % _FP_MOD
    out = np.zeros(n, np.uint64)
    nz = lens > 0
    out[nz] = np.add.reduceat(terms, offs[:-1][nz]) % _FP_MOD
    return out


def fingerprints(batch: pa.Table) -> pa.Table:
    """Document fingerprinting (rolling hash): ``fp_full`` = polynomial hash
    of the whole code-point sequence (Horner, mult 31, mod 2^31-1 — the
    classic Rabin-Karp/Karp-Rabin rolling-hash family), ``fp_min`` = winnowed
    min over 64-code-point windows at stride 32 (containment sketch).

    Both are exactly mirrored by the DuckDB oracle (`sql_fingerprints`) via
    ``list_reduce`` Horner over ``unicode()`` code points. Vectorized: all
    texts concatenated into one code-point array, per-term ``c·31^k mod p``
    products, and ``np.add.reduceat`` segment sums — no per-document Python
    loop."""
    texts = batch["text"].to_pandas().fillna("")
    n = len(texts)
    lens = texts.str.len().to_numpy().astype(np.int64)
    if n == 0 or lens.sum() == 0:
        return pa.table({"doc_id": batch["doc_id"],
                         "fp_full": pa.array(np.zeros(n, np.int64), pa.int64()),
                         "fp_min": pa.array(np.zeros(n, np.int64), pa.int64())})
    # one flat code-point array + offsets
    joined = "".join(texts.tolist())
    cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(np.uint64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    maxlen = int(lens.max())
    pows = _poly_pows(maxlen)
    # weight of position i in doc d is 31^(len_d - 1 - (i - off_d))
    doc_of = np.repeat(np.arange(n), lens)
    pos_in = np.arange(len(cp)) - offs[:-1][doc_of]
    exp = (lens[doc_of] - 1 - pos_in)
    terms = (cp * pows[exp]) % _FP_MOD          # < 2^31 each
    # segment sums: each term < 2^31, docs < 2^33 chars → sum fits uint64
    full = np.zeros(n, np.uint64)
    nz = lens > 0
    full[nz] = np.add.reduceat(terms, offs[:-1][nz]) % _FP_MOD
    mins = full.copy()
    W, STEP = _FP_WINDOW, _FP_STEP
    # windowed hashes via doc-local prefix weights: with per-doc weights
    # 31^(L-1-pos), window [s, s+W) hashes to
    #   (prefix[s+W] - prefix[s]) * 31^-(L-s-W)  (mod p, p prime)
    # — one cumsum + one gather for ALL windows of ALL docs, no per-doc loop
    win_docs = np.flatnonzero(lens > W)
    if len(win_docs):
        prefix = np.zeros(len(cp) + 1, np.uint64)
        np.cumsum(terms, out=prefix[1:])        # < 2^31·M, fits uint64 for M<2^33
        prefix %= _FP_MOD
        n_win = (lens[win_docs] - W) // STEP + 1
        woffs = np.zeros(len(win_docs) + 1, np.int64)
        np.cumsum(n_win, out=woffs[1:])
        wdoc = np.repeat(np.arange(len(win_docs)), n_win)
        within = (np.arange(woffs[-1]) - woffs[:-1][wdoc]) * STEP
        starts = offs[:-1][win_docs][wdoc] + within
        diff = (prefix[starts + W] - prefix[starts] + _FP_MOD) % _FP_MOD
        inv_exp = lens[win_docs][wdoc] - within - W      # == L - s_local - W
        whash = (diff * _inv_pows(int(inv_exp.max()) + 1)[inv_exp]) % _FP_MOD
        mins[win_docs] = np.minimum.reduceat(whash, woffs[:-1])
    return pa.table({
        "doc_id": batch["doc_id"],
        "fp_full": pa.array(full.astype(np.int64), pa.int64()),
        "fp_min": pa.array(mins.astype(np.int64), pa.int64()),
    })


def sql_fingerprints(sf_dir: str) -> str:
    """DuckDB mirror of :func:`fingerprints`: Horner polynomial hash over
    ``unicode()`` code points (mult 31, mod 2^31-1), and the winnowed min
    over 64-code-point windows at stride 32."""
    p, m, w, step = int(_FP_MOD), _FP_MULT, _FP_WINDOW, _FP_STEP
    return f"""
WITH cps AS (
  SELECT doc_id, length(coalesce(text, '')) AS n,
         list_transform(string_split(coalesce(text, ''), ''),
                        x -> unicode(x)) AS cp
  FROM documents
), fp AS (
  SELECT doc_id, n, cp,
         CASE WHEN n = 0 THEN 0
              ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), cp),
                               (a, b) -> (a * {m} + b) % {p}) END AS fp_full
  FROM cps
)
SELECT doc_id, fp_full,
       CASE WHEN n <= {w} THEN fp_full
            ELSE list_min(list_transform(
                   range(1, n - {w} + 2, {step}),
                   i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(cp, i, i + {w} - 1)),
                                    (a, b) -> (a * {m} + b) % {p})))
       END AS fp_min
FROM fp
"""


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document: word count, distinct-
    word ratio, top-word fraction, and the fraction of word-bigram positions
    whose bigram occurs more than once in the doc. High duplicate-bigram /
    low distinct-word docs are boilerplate and get filtered before training.

    Fully vectorized and batch-local (a document is one row): one explode,
    one factorize, then integer pair-code `np.unique` counting — no per-row
    Python. Ratios are exact integer divisions, so the SQL oracle matches
    bit-for-bit."""
    texts = batch["text"].to_pandas().fillna("")
    n_rows = len(texts)
    ex = texts.str.split().explode().dropna()
    doc = ex.index.to_numpy(dtype=np.int64)
    codes, uniq = pd.factorize(ex.to_numpy())
    codes = codes.astype(np.int64)
    k = np.int64(len(uniq)) + 1

    n_words = np.bincount(doc, minlength=n_rows).astype(np.int64)

    # per-(doc, word) counts via one sort of the fused pair code
    pair = doc * k + codes
    upair, ucnt = np.unique(pair, return_counts=True)
    udoc = (upair // k).astype(np.int64)
    n_distinct = np.bincount(udoc, minlength=n_rows).astype(np.int64)
    top_cnt = np.zeros(n_rows, np.int64)
    np.maximum.at(top_cnt, udoc, ucnt)

    # bigram positions: adjacent explode rows of the same doc; re-code the
    # bigram ids densely before fusing with doc so the fused code never
    # nears int64 overflow (k² × batch_size would)
    adj = np.flatnonzero(doc[1:] == doc[:-1]) if len(doc) > 1 else \
        np.empty(0, np.int64)
    bdoc = doc[adj]
    bg_u, bg_codes = np.unique(codes[adj] * k + codes[adj + 1],
                               return_inverse=True)
    k2 = np.int64(len(bg_u)) + 1
    bpair_u, bcnt = np.unique(bdoc * k2 + bg_codes, return_counts=True)
    bu_doc = (bpair_u // k2).astype(np.int64)
    n_bg = np.bincount(bdoc, minlength=n_rows).astype(np.int64)
    dup_bg = np.zeros(n_rows, np.int64)
    np.add.at(dup_bg, bu_doc[bcnt > 1], bcnt[bcnt > 1])

    nw = n_words.clip(min=1).astype(np.float64)
    nb = n_bg.clip(min=1).astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words, pa.int64()),
        "distinct_word_ratio": pa.array(
            np.round(n_distinct / nw, 9), pa.float64()),
        "top_word_frac": pa.array(np.round(top_cnt / nw, 9), pa.float64()),
        "dup_bigram_frac": pa.array(np.round(dup_bg / nb, 9), pa.float64()),
    })


def sql_repetition_stats(sf_dir: str) -> str:
    return r"""
WITH w AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS w,
         generate_subscripts(str_split(text, ' '), 1) AS i
  FROM documents
),
wt AS (SELECT * FROM w WHERE w <> ''),
wc AS (SELECT doc_id, w, count(*) AS c FROM wt GROUP BY 1, 2),
ws AS (SELECT doc_id, sum(c) AS n_words, count(*) AS nd, max(c) AS topc
       FROM wc GROUP BY 1),
bg AS (SELECT doc_id,
              w || chr(1) || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS b
       FROM wt QUALIFY b IS NOT NULL),
bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
bs AS (SELECT doc_id, sum(c) AS n_bg,
              sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bg
       FROM bgc GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(ws.n_words, 0) AS BIGINT) AS n_words,
       round(coalesce(ws.nd, 0) * 1.0 / greatest(coalesce(ws.n_words, 0), 1), 9)
         AS distinct_word_ratio,
       round(coalesce(ws.topc, 0) * 1.0 / greatest(coalesce(ws.n_words, 0), 1), 9)
         AS top_word_frac,
       round(coalesce(bs.dup_bg, 0) * 1.0 / greatest(coalesce(bs.n_bg, 0), 1), 9)
         AS dup_bigram_frac
FROM documents d
LEFT JOIN ws ON d.doc_id = ws.doc_id
LEFT JOIN bs ON d.doc_id = bs.doc_id
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_text_stats(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TextStats, batch_format="pyarrow", batch_size=8192,
                          concurrency=actor_pool())


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
                          concurrency=actor_pool())


def q_lang_id(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas", batch_size=4096,
                          concurrency=actor_pool())


def q_repetition_stats(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats, batch_format="pyarrow",
                          batch_size=8192)


def q_fingerprints(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprints, batch_format="pyarrow", batch_size=8192)

"""Deduplication operators over the `documents` table.

Five dedup families, each in its at-scale shape (SURVEY's training-data
extension; patterns per the Ray guide's sketch/pre-aggregation rules):

- exact          : content hash → groupby(hash) keep min doc_id (pre-aggregated)
- minhash + LSH  : shingle → minhash sig → band buckets → candidate pairs →
                   Jaccard verify → connected components via label propagation
- simhash        : 64-bit simhash, 4-band blocking for hamming≤k candidates
- n-gram Jaccard : the exact verifier used by the LSH path, exposed standalone
- embedding cos  : exact small-scale pairs (SQL-oracle-checkable) and an
                   LSH-bucketed approximate variant (the 100 TB path)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> rd.Dataset:
    """One surviving doc_id (the min) per distinct text + duplicate count.

    Pre-aggregates inside map_batches (per-batch min/count per hash), then a
    small groupby over partials — the combiner pattern; the wide exchange
    moves one row per distinct text per batch, not one per document."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "h": pd.util.hash_array(t["text"].to_numpy(zero_copy_only=False).astype(object)).view(np.int64),
            "doc_id": t["doc_id"].to_numpy(),
        })
        g = df.groupby("h", as_index=False).agg(doc_id=("doc_id", "min"),
                                                n_dupes=("doc_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Min, Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("h")
              .aggregate(Min("doc_id", alias_name="doc_id"),
                         Sum("n_dupes", alias_name="n_dupes"))
              .select_columns(["doc_id", "n_dupes"]))


def sql_dedup_exact(sf_dir: str) -> str:
    return """
SELECT min(doc_id) AS doc_id, count(*) AS n_dupes
FROM documents GROUP BY text
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    b = text.encode("utf-8", "ignore")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    arr = np.frombuffer(b, np.uint8).astype(np.uint64)
    view = np.lib.stride_tricks.sliding_window_view(arr, k)
    weights = np.uint64(31) ** np.arange(k, dtype=np.uint64)
    return np.unique((view * weights).sum(axis=1, dtype=np.uint64))


class MinHasher:
    """Per-batch minhash signatures; permutation coefficients generated once
    per worker (seeded → identical across workers)."""

    def __init__(self, num_perm: int = 128, k: int = 5, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p per permutation; min over shingles
        v = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts])
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.array(list(sigs.astype(np.uint64))),
        })


def minhash_band_rows(batch: pa.Table, bands: int = 16) -> pa.Table:
    """Explode signatures into (band_id, band_hash, doc_id) rows — the LSH
    bucketing key for the groupby."""
    sigs = np.stack(batch["sig"].to_pandas().to_numpy())
    n, num_perm = sigs.shape
    rows_per = num_perm // bands
    doc = batch["doc_id"].to_numpy()
    out_doc, out_band, out_hash = [], [], []
    for bnd in range(bands):
        seg = sigs[:, bnd * rows_per:(bnd + 1) * rows_per]
        h = pd.util.hash_array(np.ascontiguousarray(seg).view(
            [("", np.uint64)] * rows_per).ravel())
        out_doc.append(doc)
        out_band.append(np.full(n, bnd, np.int32))
        out_hash.append(h)
    return pa.table({
        "band": pa.array(np.concatenate(out_band), pa.int32()),
        "band_hash": pa.array(np.concatenate(out_hash), pa.uint64()),
        "doc_id": pa.array(np.concatenate(out_doc)),
    })


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].to_numpy())
    if len(ids) < 2 or len(ids) > 200:     # cap pathological buckets
        return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
    i, j = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[i], "b": ids[j]})


def minhash_candidates(sf_dir: str, num_perm: int = 128, bands: int = 16
                       ) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(MinHasher, batch_format="pyarrow", batch_size=2048,
                          concurrency=2,
                          fn_constructor_kwargs=dict(num_perm=num_perm))
    bandrows = sigs.map_batches(lambda t: minhash_band_rows(t, bands),
                                batch_format="pyarrow")
    pairs = bandrows.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas")
    return pairs


def jaccard_verify(pairs_df: pd.DataFrame, texts: dict[int, str], k: int = 5,
                   threshold: float = 0.7) -> pd.DataFrame:
    """Exact n-gram Jaccard over candidate pairs (the LSH verifier)."""
    out_a, out_b, out_j = [], [], []
    cache: dict[int, np.ndarray] = {}

    def sh(d: int) -> np.ndarray:
        if d not in cache:
            cache[d] = _shingle_hashes(texts.get(d, ""), k)
        return cache[d]

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            out_a.append(int(a)); out_b.append(int(b)); out_j.append(round(j, 6))
    return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})


def q_dedup_minhash(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """Near-dup clusters: LSH candidates → Jaccard verify → connected
    components (min-label propagation on the driver; candidate set is small
    relative to the corpus — for larger pair sets iterate the propagation as
    repeated groupby-min rounds)."""
    pairs = pa.Table.from_pandas(
        minhash_candidates(sf_dir).to_pandas().drop_duplicates(),
        preserve_index=False)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    verified = jaccard_verify(pairs.to_pandas(), texts, threshold=threshold)
    # union-find over verified pairs
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(verified["a"], verified["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    return pa.table({
        "doc_id": pa.array(members, pa.int64()),
        "cluster_id": pa.array([find(m) for m in members], pa.int64()),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over word features; 4×16-bit band keys for blocking
    (hamming ≤ 3 ⇒ at least one identical band)."""

    def __init__(self, seed: int = 11) -> None:
        import re
        self.word_re = re.compile(r"[\w']+", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pandas().fillna("")
        sims = np.zeros(len(texts), np.uint64)
        for i, t in enumerate(texts):
            words = self.word_re.findall(t.lower())
            if not words:
                continue
            hashes = pd.util.hash_array(np.array(words, dtype=object))
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sims[i] = np.packbits((v > 0).astype(np.uint8)[::-1]).view(">u8")[0]
        out = pa.table({"doc_id": batch["doc_id"],
                        "simhash": pa.array(sims, pa.uint64())})
        for b in range(4):
            band = ((sims >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.uint32)
            out = out.append_column(f"band{b}", pa.array(band, pa.uint32()))
        return out


def q_dedup_simhash(sf_dir: str) -> pa.Table:
    """Simhash near-dup pairs: block on any equal 16-bit band, verify
    hamming distance ≤ 3."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", batch_size=2048,
                          concurrency=2)
    frames = []
    for b in range(4):
        part = sigs.select_columns(["doc_id", "simhash", f"band{b}"]) \
                   .groupby(f"band{b}").map_groups(
            lambda g: _simhash_bucket_pairs(g), batch_format="pandas")
        frames.append(part.to_pandas())
    pairs = pd.concat(frames).drop_duplicates(subset=["a", "b"])
    return pa.Table.from_pandas(
        pairs.sort_values(["a", "b"]).reset_index(drop=True), preserve_index=False)


def _simhash_bucket_pairs(g: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    ids = g["doc_id"].to_numpy()
    sims = g["simhash"].to_numpy().astype(np.uint64)
    if len(ids) < 2 or len(ids) > 500:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "hamming": pd.Series([], dtype=np.int64)})
    order = np.argsort(ids)
    ids, sims = ids[order], sims[order]
    i, j = np.triu_indices(len(ids), k=1)
    x = sims[i] ^ sims[j]
    ham = np.zeros(len(x), np.int64)
    while x.any():
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    keep = ham <= max_hamming
    return pd.DataFrame({"a": ids[i][keep], "b": ids[j][keep],
                         "hamming": ham[keep]})


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def q_embedding_pairs_exact(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """All embedding pairs with cosine ≥ threshold — exact, via blockwise
    matmul against a broadcast normalized matrix (small-side broadcast
    pattern; SQL-oracle-checkable)."""
    import ray

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    tbl = pa.Table.from_pandas(emb.to_pandas(), preserve_index=False)
    ids = tbl["vec_id"].to_numpy()
    mat = np.stack(tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
    mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    ref = ray.put((ids, mat))

    def block(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bid = t["vec_id"].to_numpy()
        bm = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
        bm /= np.clip(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12, None)
        cos = bm @ all_mat.T
        ai, bj = np.nonzero(cos >= threshold)
        a, b = bid[ai], all_ids[bj]
        keep = a < b
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "cos_sim": pa.array(np.round(cos[ai, bj][keep], 4), pa.float64()),
        })

    out = emb.map_batches(block, batch_format="pyarrow", batch_size=1024)
    df = out.to_pandas()
    if df.empty:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cos_sim": pa.array([], pa.float64())})
    return pa.Table.from_pandas(
        df.sort_values(["a", "b"]).reset_index(drop=True), preserve_index=False)


def sql_embedding_pairs_exact(sf_dir: str) -> str:
    return f"""
SELECT e1.vec_id AS a, e2.vec_id AS b,
       round(list_cosine_similarity(e1.embedding, e2.embedding), 4) AS cos_sim
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.4
"""


def q_embedding_neardup_lsh(sf_dir: str, threshold: float = 0.4,
                            n_planes: int = 4, seed: int = 5) -> pa.Table:
    """Scale path: random-hyperplane LSH buckets → exact cosine within
    buckets only. Approximate (recall < 1); bucket key is a 16-bit sign
    pattern, so the wide exchange moves one row per (doc, table) instead of
    the O(n²) comparison space."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    first = pa.Table.from_pandas(emb.limit(1).to_pandas(), preserve_index=False)
    dim = len(first["embedding"][0].as_py())
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def bucketize(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
        m /= np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        signs = (m @ planes) > 0
        key = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        out = t.append_column("bucket", pa.array(key, pa.int64()))
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "cos_sim": pd.Series([], dtype=np.float64)})
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m /= np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        cos = m @ m.T
        i, j = np.triu_indices(len(ids), k=1)
        keep = cos[i, j] >= threshold
        return pd.DataFrame({"a": np.minimum(ids[i], ids[j])[keep],
                             "b": np.maximum(ids[i], ids[j])[keep],
                             "cos_sim": np.round(cos[i, j][keep], 6)})

    buck = emb.map_batches(bucketize, batch_format="pyarrow", batch_size=4096)
    pairs = buck.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    df = pairs.to_pandas()
    if df.empty:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cos_sim": pa.array([], pa.float64())})
    df = df.drop_duplicates(subset=["a", "b"])
    return pa.Table.from_pandas(df.sort_values(["a", "b"]).reset_index(drop=True),
                                preserve_index=False)

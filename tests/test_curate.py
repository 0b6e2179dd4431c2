"""Curation ops: sequence packing, decontamination, keep-best purge."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmpdir, ids, texts, n_chars=None):
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["t"] * len(ids)),
        "n_chars": pa.array(n_chars or [len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, f"{tmpdir}/documents.parquet")
    return str(tmpdir)


def test_sequence_pack_coordinates(tmp_path):
    # ids with a gap; token counts 3/1/0/5 (multi-space + empty cases)
    sf = _write_docs(tmp_path, [0, 1, 7, 8],
                     ["a b c", "solo", "", "v w  x y z"])
    from olrx.ops.curate import q_sequence_pack

    out = (q_sequence_pack(sf, seq_len=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out.n_tokens) == [3, 1, 0, 5]
    # costs 4/2/1/6 → starts 0/4/6/7
    assert list(out.start_tok) == [0, 4, 6, 7]
    assert list(out.seq_idx) == [0, 0, 0, 0]
    assert list(out.seq_off) == [0, 4, 6, 7]


def test_sequence_pack_multibucket_prefix_sum(tmp_path):
    # span > _MIN_BUCKET_DOCS so the distributed prefix sum crosses buckets
    n = 700
    rng = np.random.default_rng(7)
    ntok = rng.integers(0, 9, n)
    texts = [" ".join(["tok"] * k) for k in ntok]
    sf = _write_docs(tmp_path, list(range(n)), texts)
    from olrx.ops.curate import q_sequence_pack

    out = (q_sequence_pack(sf, seq_len=128).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    cost = ntok + 1
    starts = np.concatenate([[0], np.cumsum(cost)[:-1]])
    assert (out.start_tok.to_numpy() == starts).all()
    assert (out.seq_idx.to_numpy() == starts // 128).all()


def test_contamination_flags_shared_long_ngrams(tmp_path):
    probe = "the secret benchmark answer is forty two exactly"
    sf = _write_docs(tmp_path, [0, 1, 2], [
        f"eval doc holds {probe} inside it",          # id 0 → eval stratum
        f"train doc leaked {probe} verbatim here",    # shares 20-gram
        "an entirely innocent training document about gardening tools",
    ])
    from olrx.ops.curate import q_contamination

    out = q_contamination(sf).to_pandas()
    assert list(out.doc_id) == [1]
    assert out.n_hits.iloc[0] > 0


def test_contamination_join_path_matches_broadcast(tmp_path):
    """broadcast_cap=0 forces the distributed semi-join path; both paths
    must produce identical tables (the cap only changes the data movement,
    never the answer)."""
    probe = "the secret benchmark answer is forty two exactly"
    sf = _write_docs(tmp_path, [0, 1, 2, 3], [
        f"eval doc holds {probe} inside it",
        f"train doc leaked {probe} verbatim here",
        "an entirely innocent training document about gardening tools",
        f"another leaker repeating {probe} once more for luck",
    ])
    from olrx.ops.curate import q_contamination

    bcast = q_contamination(sf)
    joined = q_contamination(sf, broadcast_cap=0)
    assert joined.schema == bcast.schema
    assert joined.equals(bcast)
    assert sorted(joined["doc_id"].to_pylist()) == [1, 3]


def test_curation_pipeline_composes_all_three_stages(tmp_path):
    """Quality gate drops the junk docs, the purge drops the worse near-dup
    twin, and the survivors get contiguous pack coordinates in id order."""
    base = ("the quick brown fox jumps over the lazy dog and it runs far "
            "into the deep dark forest looking for food and water " * 2)
    texts = [
        base,                                   # 0: near-dup twin (worse)
        base.replace("lazy", "sleepy"),         # 1: near-dup twin (kept)
        "this is a perfectly ordinary document about the weather and "
        "the seasons that we see in the mountains every single year",  # 2
        "tiny",                                 # 3: quality fail (length)
        ">>> !!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === [[[ ]]]"
        " {{{ }}} ||| ::: ;;; ''' !!! ??? ###",  # 4: quality fail (punct)
    ]
    sf = _write_docs(tmp_path, [0, 1, 2, 3, 4], texts,
                     n_chars=[100, 300, 120, 4, 90])
    from olrx.ops.curate import q_curation_pipeline

    out = (q_curation_pipeline(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # survivors: 1 (best of the near-dup cluster by n_chars) and 2
    assert list(out.doc_id) == [1, 2]
    assert list(out.start_tok) == [0, out.n_tokens.iloc[0] + 1]
    assert (out.n_tokens > 0).all()


def test_keep_best_purge_plan(tmp_path):
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "into the deep dark forest looking for food " * 3)
    texts = [base, base, base.replace("lazy", "sleepy"),
             "unrelated text about ships and oceans " * 5]
    # doc 2 declared longest → must be the kept representative
    sf = _write_docs(tmp_path, [0, 1, 2, 3], texts,
                     n_chars=[100, 100, 300, 50])
    from olrx.ops.dedup import q_dedup_keep_best

    out = (q_dedup_keep_best(sf, threshold=0.6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out.doc_id) == [0, 1]
    assert set(out.kept_doc_id) == {2}

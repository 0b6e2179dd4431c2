"""Schema evolution: physically-mixed segment schemas (pre/post-DDL files).

The reference applies dictionary DML at the DDL's SCN and serializes the
evolved schema into checkpoints (SystemTransaction.cpp:729,
SerializerJson.cpp:805-820). Here: early log segments genuinely LACK the
additive column in their ``after`` struct; the reader must unify and the
replay must produce the full-width table with nulls for pre-DDL rows.
"""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from olrx.gen import GenConfig, ensure_changelog
from olrx.oracle import apply_naive
from olrx.pipelines.replay import ReplayConfig, replay_dataset
from tests.conftest import sorted_table


@pytest.fixture(scope="module")
def mixed_schema_dir(tmp_path_factory):
    """Rewrite pre-DDL segments WITHOUT the tool_meta struct field."""
    src = ensure_changelog(GenConfig(scale=0.001))
    dst = tmp_path_factory.mktemp("mixed")
    meta = __import__("json").load(open(os.path.join(src, "_COMPLETE")))
    ddl_scn = meta["ddl_scn"]
    for p in sorted(glob.glob(src + "/*.parquet")):
        t = pq.read_table(p)
        max_scn = pc.max(t["scn"]).as_py()
        if max_scn < ddl_scn:  # fully pre-DDL segment → narrow physical schema
            for col in ("before", "after"):
                arr = t[col].combine_chunks()
                names = [f.name for f in arr.type if f.name != "tool_meta"]
                children = [pc.struct_field(arr, nm) for nm in names]
                narrow = pa.StructArray.from_arrays(
                    children, names=names,
                    mask=pc.is_null(arr))
                t = t.set_column(t.schema.get_field_index(col), col, narrow)
        pq.write_table(t, str(dst / os.path.basename(p)))
    return str(dst), src


def test_mixed_schema_replay(mixed_schema_dir):
    dst, src = mixed_schema_dir
    paths = sorted(glob.glob(dst + "/*.parquet"))
    full = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(src + "/*.parquet"))])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    res = replay_dataset(paths, ReplayConfig(num_partitions=8))
    got = sorted_table(res.dataset, exp.schema)
    assert got.equals(exp)


def test_drop_column_mid_stream():
    """Non-additive evolution (reference SystemTransaction::processDelete,
    /root/reference/src/builder/SystemTransaction.cpp:640): tool_meta is
    added at ddl_scn and DROPPED again at drop_scn. The final table must
    lack the column entirely; pre-drop rows (whose images carry it) stay
    replayable. Engine vs the independent naive oracle, row-for-row."""
    import json

    d = ensure_changelog(GenConfig(scale=0.001, ddl_drop=True))
    meta = json.load(open(os.path.join(d, "_COMPLETE")))
    assert meta["drop_scn"] > meta["ddl_scn"] > 0
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert "tool_meta" not in exp.schema.names  # oracle models the drop
    res = replay_dataset(paths, ReplayConfig(num_partitions=8))
    got = sorted_table(res.dataset, exp.schema)
    assert got.equals(exp)


def test_drop_column_lake_fence_and_resume(tmp_path):
    """The lake manifests record the dropped column (the version fence) and
    an incremental replay across the drop boundary converges to the same
    dropped-schema state: partitions written pre-drop carry tool_meta in
    their snapshots, the resumed run removes it."""
    import json

    from olrx.pipelines.replay import read_lake, replay_to_lake
    from olrx.state import manifest as MF

    d = ensure_changelog(GenConfig(scale=0.001, ddl_drop=True))
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    out = str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=8)
    # leg 1: only the first segments (the drop DDL commits late in the
    # stream, so this lake may still carry tool_meta)
    first = [p for p in paths if "seg0000" in p or "seg0001" in p]
    replay_to_lake(first, out, cfg)
    # leg 2: full stream resumes over the same lake — crosses the drop
    replay_to_lake(paths, out, cfg)
    got = sorted_table(read_lake(out), exp.schema)
    assert got.equals(exp)
    ms = MF.read_all(os.path.join(out, "_manifest"))
    assert ms and all(m.dropped_columns == ["tool_meta"] for m in ms.values())


def test_rename_column_mid_stream():
    """Dictionary-row UPDATE (reference SystemTransaction::processUpdate,
    /root/reference/src/builder/SystemTransaction.cpp:525): `tool` is renamed
    to `tool_label` at rename_scn. Data and column identity are untouched —
    the final table carries the NEW name over all rows (pre- and post-rename
    values alike). Engine vs the independent naive oracle, row-for-row."""
    import json

    d = ensure_changelog(GenConfig(scale=0.001, ddl_rename=True))
    meta = json.load(open(os.path.join(d, "_COMPLETE")))
    assert meta["rename_scn"] > 0
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert "tool_label" in exp.schema.names and "tool" not in exp.schema.names
    res = replay_dataset(paths, ReplayConfig(num_partitions=8))
    got = sorted_table(res.dataset, exp.schema)
    assert got.equals(exp)


def test_rename_column_lake_fence_and_resume(tmp_path):
    """The lake manifests record the rename mapping (version fence) and an
    incremental replay across the rename boundary converges: partitions
    checkpointed pre-rename store `tool`, the resumed run re-labels the same
    physical data `tool_label` without orphaning it."""
    import json

    from olrx.pipelines.replay import read_lake, replay_to_lake
    from olrx.state import manifest as MF

    d = ensure_changelog(GenConfig(scale=0.001, ddl_rename=True))
    meta = json.load(open(os.path.join(d, "_COMPLETE")))
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    out = str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=8)
    # leg 1: stop BEFORE the rename commits — the lake snapshot stores `tool`
    import dataclasses
    cfg1 = dataclasses.replace(cfg, end_commit_scn=meta["rename_scn"] - 1)
    replay_to_lake(paths, out, cfg1)
    ms1 = MF.read_all(os.path.join(out, "_manifest"))
    assert ms1 and all(m.renamed_columns == {} for m in ms1.values())
    # leg 2: full stream resumes over the same lake — crosses the rename
    replay_to_lake(paths, out, cfg)
    got = sorted_table(read_lake(out), exp.schema)
    assert got.equals(exp)
    ms = MF.read_all(os.path.join(out, "_manifest"))
    assert ms and all(m.renamed_columns == {"tool": "tool_label"}
                      for m in ms.values())


def _synthetic_ddl_segment(src_dir: str, dst_dir: str, *, seq: int,
                           scn: int, xid: str, payload: str) -> str:
    """Clone the generator's 3-row committed DDL txn shape (B / DDL / C —
    see olrx/gen.py ddl_txns) into a fresh segment file with the given
    commit position, so tests can extend a cached changelog with extra DDLs
    without regenerating (the cache dir itself is never touched)."""
    import json as _json

    src = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(src_dir + "/*.parquet"))])
    proto = src.filter(pc.equal(src["xid"], "xrename"))
    assert proto.num_rows == 3, "generator DDL txn shape changed"
    order = pc.sort_indices(proto, sort_keys=[("scn_idx", "ascending")])
    proto = proto.take(order)   # B, DDL, C
    edits = {
        "scn": pa.array([scn - 1, scn, scn], pa.int64()),
        "scn_idx": proto["scn_idx"],
        "seq": pa.array([seq] * 3, pa.int32()),
        "xid": pa.array([xid] * 3, pa.string()),
        "ddl": pa.array([None, payload, None], pa.string()),
    }
    t = proto
    for name, col in edits.items():
        t = t.set_column(t.schema.get_field_index(name), name, col)
    _json.loads(payload)    # payload must be valid JSON
    out = os.path.join(dst_dir, f"shard00-seg{seq:04d}.parquet")
    pq.write_table(t, out)
    return out


@pytest.fixture(scope="module")
def chained_rename_dir(tmp_path_factory):
    """The ddl_rename changelog (tool → tool_label) plus a SECOND committed
    rename (tool_label → tool_tag) appended after the stream's max SCN."""
    src = ensure_changelog(GenConfig(scale=0.001, ddl_rename=True))
    dst = tmp_path_factory.mktemp("chain")
    import shutil

    for p in sorted(glob.glob(src + "/*.parquet")):
        shutil.copy(p, str(dst / os.path.basename(p)))
    _synthetic_ddl_segment(
        src, str(dst), seq=4, scn=9001, xid="xrename2",
        payload='{"rename_columns": {"tool_label": "tool_tag"}}')
    return str(dst)


def test_rename_chain_resolves_to_last(chained_rename_dir):
    """A rename CHAIN (tool → tool_label → tool_tag, two committed
    dictionary-row UPDATEs) resolves to the last display name over one
    stable physical identity: the control pass maps physical `tool` straight
    to `tool_tag`, and the replayed table carries only the final name —
    engine vs the independent naive oracle (which resolves chains with its
    own reverse lookup), row-for-row."""
    from olrx.stages.decode import load_control

    paths = sorted(glob.glob(chained_rename_dir + "/*.parquet"))
    info = load_control(paths)
    assert info.renamed_columns == {"tool": "tool_tag"}
    assert [(p, n) for _, p, n in info.rename_ops] == \
        [("tool", "tool_label"), ("tool", "tool_tag")]
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert "tool_tag" in exp.schema.names
    assert not {"tool", "tool_label"} & set(exp.schema.names)
    res = replay_dataset(paths, ReplayConfig(num_partitions=8))
    got = sorted_table(res.dataset, exp.schema)
    assert got.equals(exp)


def test_rename_then_drop_by_new_name(chained_rename_dir, tmp_path):
    """A DROP that names the post-rename display name must resolve through
    the rename chain to the physical column (reference SystemTransaction
    applies dictionary UPDATEs and DELETEs in commit order): dropping
    `tool_tag` removes physical `tool`, and the final table carries none of
    the three names."""
    import shutil

    from olrx.stages.decode import load_control

    d = str(tmp_path / "chain_drop")
    os.makedirs(d)
    for p in sorted(glob.glob(chained_rename_dir + "/*.parquet")):
        shutil.copy(p, os.path.join(d, os.path.basename(p)))
    src = ensure_changelog(GenConfig(scale=0.001, ddl_rename=True))
    _synthetic_ddl_segment(
        src, d, seq=5, scn=9101, xid="xdrop2",
        payload='{"drop_columns": ["tool_tag"]}')
    paths = sorted(glob.glob(d + "/*.parquet"))
    info = load_control(paths)
    assert info.dropped_columns == ("tool",)
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert not {"tool", "tool_label", "tool_tag"} & set(exp.schema.names)
    res = replay_dataset(paths, ReplayConfig(num_partitions=8))
    got = sorted_table(res.dataset, exp.schema)
    assert got.equals(exp)


def test_rename_with_stale_partitions(tmp_path):
    """A rename increment that routes events to only ONE partition must not
    corrupt the others. Parquet schema projection matches by NAME, so before
    this round's fix `read_lake` silently NULLed the `tool` data of every
    partition whose snapshot predated the rename (its manifest — and file —
    still said `tool` while the unified schema asked for `tool_label`), and
    `read_lake_asof` unioned both names as separate half-null columns. Both
    reads must relabel per epoch: renames change display only, physical
    identity is stable (SystemTransaction.cpp:525)."""
    import shutil

    from olrx.pipelines.replay import read_lake, replay_to_lake
    from olrx.pipelines.timetravel import read_lake_asof
    from olrx.state import manifest as MF

    src = ensure_changelog(GenConfig(scale=0.001))
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for p in sorted(glob.glob(src + "/*.parquet")):
        shutil.copy(p, os.path.join(d, os.path.basename(p)))
    out = str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=8, snapshot_keep=4)
    # leg 1: full replay of the original stream — every snapshot says `tool`
    replay_to_lake(sorted(glob.glob(d + "/*.parquet")), out, cfg)

    # increment: one committed RENAME plus one committed single-row INSERT
    # (a brand-new conversation) — exactly one partition sees fresh events
    full = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(d + "/*.parquet"))])
    donor_i = full.filter(pc.equal(full["op"], "I")).slice(0, 1).to_pylist()[0]
    donor_b = full.filter(pc.equal(full["op"], "B")).slice(0, 1).to_pylist()[0]
    donor_c = full.filter(pc.equal(full["op"], "C")).slice(0, 1).to_pylist()[0]

    def _row(donor, **kw):
        r = dict(donor)
        r.update(shard=0, seq=4, **kw)
        return r

    rows = [
        _row(donor_b, xid="xren", scn=9000, scn_idx=0),
        _row(donor_b, xid="xren", op="DDL", scn=9001, scn_idx=1,
             ddl='{"rename_columns": {"tool": "tool_label"}}'),
        _row(donor_c, xid="xren", scn=9001, scn_idx=1048576),
        _row(donor_b, xid="xnew", scn=9049, scn_idx=0),
        _row(donor_i, xid="xnew", scn=9050, scn_idx=0,
             conv_id="zz-new-conv", turn_idx=0),
        _row(donor_c, xid="xnew", scn=9050, scn_idx=1048576),
    ]
    seg = pa.Table.from_pylist(rows, schema=full.schema)
    pq.write_table(seg, os.path.join(d, "shard00-seg0004.parquet"))

    # leg 2: incremental replay — only zz-new-conv's partition rewrites
    paths = sorted(glob.glob(d + "/*.parquet"))
    replay_to_lake(paths, out, cfg)
    ms = MF.read_all(os.path.join(out, "_manifest"))
    epochs = {tuple(sorted(m.renamed_columns.items())) for m in ms.values()}
    assert epochs == {(), (("tool", "tool_label"),)}, \
        "test premise: the lake must hold BOTH rename epochs"

    exp = apply_naive(
        pa.concat_tables([pq.read_table(p) for p in paths])).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert "tool_label" in exp.schema.names
    got = sorted_table(read_lake(out), exp.schema)
    assert got.equals(exp)   # stale partitions' tool values NOT nulled

    # as-of at the final commit straddles the rename across partitions
    asof = sorted_table(read_lake_asof(out, 9050), exp.schema)
    assert asof.equals(exp)

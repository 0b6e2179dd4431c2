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

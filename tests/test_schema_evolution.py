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

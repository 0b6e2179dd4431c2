"""Shared fixtures: one Ray session per pytest run, one generated changelog."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def gen_small():
    """Cached small changelog (full images) + its segment paths + full table."""
    from olrx.gen import GenConfig, ensure_changelog

    cfg = GenConfig(scale=0.001)
    d = ensure_changelog(cfg)
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    return cfg, d, paths, full


@pytest.fixture(scope="session")
def expected_small(gen_small):
    from olrx.oracle import apply_naive

    _, _, _, full = gen_small
    return apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])


def sorted_table(obj, schema=None) -> pa.Table:
    """Normalize a Dataset/DataFrame/Table to a (conv_id, turn_idx)-sorted table."""
    import pandas as pd
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        obj = pa.Table.from_pandas(obj.to_pandas(), preserve_index=False)
    elif isinstance(obj, pd.DataFrame):
        obj = pa.Table.from_pandas(obj, preserve_index=False)
    keys = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    if "table_name" in obj.schema.names:
        keys = [("table_name", "ascending")] + keys
    t = obj.sort_by(keys)
    return t.cast(schema) if schema is not None else t

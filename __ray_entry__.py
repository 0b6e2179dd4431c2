"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in `olrx`) calls ``ray.init()`` / ``ray.shutdown()``.

The CDC queries run over a deterministic synthetic changelog (BASELINE.json
input_hint: the transcripts table does not exist in /root/testdata, so it is
synthesized — seeded, cached on disk by config digest). Ray pipeline and
DuckDB oracle read the same parquet bytes; the oracle SQL embeds absolute
``read_parquet('/tmp/olrx_data/...')`` paths, which DuckDB accepts alongside
the pre-registered testdata views.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

#: the driver compares at sf=0.01; oracle_sql() strings are bound to it
_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline: full CDC replay of the sf0.001-scale changelog to
    final transcript table state (Dataset of rows)."""
    from olrx.pipelines.queries import q_cdc_replay

    return q_cdc_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from olrx.pipelines.queries import CDC_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(CDC_QUERIES)
    try:
        from olrx.ops.registry import OPS_QUERIES
        out.update(OPS_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from olrx.pipelines.queries import CDC_ORACLES

    out = {name: fn(_ORACLE_SF_DIR) for name, fn in CDC_ORACLES.items()}
    try:
        from olrx.ops.registry import OPS_ORACLES
        out.update({name: fn(_ORACLE_SF_DIR) for name, fn in OPS_ORACLES.items()})
    except ImportError:
        pass
    return out

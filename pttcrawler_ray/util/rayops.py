"""Small Ray Data helpers.

:func:`sort_nullable_ts` works around a Ray 2.49 sort defect observed in
this environment: ``Dataset.sort`` on a column containing nulls, downstream
of a ``groupby().map_groups`` chain, duplicates rows nondeterministically
(reproduced in isolation; see tests/test_aux_pipelines.py history).  The
workaround sorts on a non-null int64 surrogate (epoch micros; nulls mapped
to an extreme sentinel).  Nulls-first ascending matches SQLite's ``ORDER
BY`` semantics the reference relies on (reference ``export.py:60``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_SENTINEL_LOW = -(2**62)
_SENTINEL_HIGH = 2**62
_KEY = "__sort_surrogate"


def sort_nullable_ts(ds, col: str, descending: bool = False, nulls_first: bool = True,
                     extra_cols: list[str] | None = None):
    """Sort by a NULLABLE timestamp/int column (plus non-null tiebreak
    columns) without tripping the Ray 2.49 null-key duplication bug: the
    nullable key is replaced by a non-null int64 surrogate.  The bug is
    parallelism-dependent (never fires in 4-cpu test sessions, reliably
    fires at 32 cpus), so every nullable-key sort in the repo must come
    through here."""
    sentinel = _SENTINEL_LOW if (nulls_first != descending) else _SENTINEL_HIGH

    def add_key(t: pa.Table) -> pa.Table:
        micros = pc.cast(t[col], pa.int64())
        return t.append_column(_KEY, pc.fill_null(micros, sentinel))

    keys = [_KEY, *(extra_cols or [])]
    out = ds.map_batches(add_key, batch_format="pyarrow").sort(
        keys if len(keys) > 1 else _KEY, descending=descending)
    return out.map_batches(lambda t: t.drop_columns([_KEY]), batch_format="pyarrow")


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def read_parquet_clean(path, **kw):
    """``rd.read_parquet`` with schema metadata stripped from every block.

    Parquet written via pandas carries a ``b'pandas'`` schema-metadata blob
    that makes ``pa.Schema`` unhashable; Ray's block-schema dedup then
    falls back to re-unifying schemas in EVERY reduce/merge task (and logs
    "Failed to hash the schemas" per task).  Stripping is metadata-only
    (zero-copy) and fuses with the read stage.
    """
    import ray.data as rd

    ds = rd.read_parquet(path, **kw)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


# ------------------------------------------------------------- broadcast get
# per-worker-process cache for broadcast ObjectRefs used by STATELESS
# map_batches tasks: for stages whose setup is just a ray.get of a small
# broadcast object, plain tasks in Ray's prestarted workers beat an actor
# pool (whose spin-up often costs more wall time than the stage computes);
# the cache makes the ray.get once-per-process instead of once-per-batch.
#
# LRU of 2: a stage uses at most a couple of refs at a time, and a tiny
# capacity means a LARGE broadcast object (e.g. a verify-stage shingle
# dict) is dropped from every long-lived worker as soon as the next
# stage's refs pass through, instead of pinning worker RSS for the rest
# of the session.  Eviction is per-entry (oldest first), never a
# wholesale clear that would also evict the running stage's hot entry.
from collections import OrderedDict

_BCAST_CACHE: "OrderedDict[str, object]" = OrderedDict()
_BCAST_CAPACITY = 2


def bcast_get(ref):
    """ray.get(ref), LRU-cached per worker process."""
    key = ref.hex()
    if key in _BCAST_CACHE:
        _BCAST_CACHE.move_to_end(key)
        return _BCAST_CACHE[key]
    import ray

    val = ray.get(ref)
    _BCAST_CACHE[key] = val
    while len(_BCAST_CACHE) > _BCAST_CAPACITY:
        _BCAST_CACHE.popitem(last=False)
    return val

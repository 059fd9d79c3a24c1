"""Distributed joins for Ray Data.

Ray Data (2.49) has no native large-x-large join; this module provides
the canonical shapes (SURVEY.md §2.D custom-operator patterns):

* ``broadcast_lookup`` pattern — small side shipped once via ray.put,
  vectorized searchsorted lookup inside map_batches (used by
  revenue_by_nation in table_ops).
* ``hash_join`` — both sides hash-partitioned on the key into P coarse
  partitions, co-located by groupby(part), merged vectorized (pandas)
  inside each partition group.  The two sides flow through one union with
  a *flat* combined schema (each side fills the other side's columns with
  nulls) — flat primitive columns shuffle/sort far faster than
  struct-wrapped rows.  One shuffle, bounded per-task memory
  (~|L|/P + |R|/P rows), P scales with the cluster.  Skew: a
  pathologically hot key lands in one partition — salt the key (append
  hash(row)%k for the hot values on both sides) when a key exceeds the
  partition budget.
* ``asof_join`` — backward as-of (latest right row at-or-before each
  left timestamp per key) with the same partitioning, merged with
  pandas merge_asof.

Column names must be disjoint across sides (callers rename first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pd_table(df: pd.DataFrame, schema: pa.Schema | None = None) -> pa.Table:
    """from_pandas with the b'pandas' schema metadata stripped: blocks
    with and without that metadata hash as *different* schemas in Ray's
    shuffle dedup ("Failed to hash the schemas" warnings) even when the
    columns are identical."""
    t = pa.Table.from_pandas(df, preserve_index=False, schema=schema)
    return t.replace_schema_metadata(None)


def _part_of(col: pa.ChunkedArray, n_parts: int) -> np.ndarray:
    vals = col.to_pandas()
    # stable deterministic hash for any dtype (murmur-based, seed fixed)
    h = pd.util.hash_array(vals.to_numpy(), hash_key="0123456789123456")
    return (h % np.uint64(n_parts)).astype(np.int32)


def _arrow_type(t) -> pa.DataType:
    """Ray's Dataset.schema().types may hold Python/numpy types (e.g. for
    from_pandas object columns) — coerce to a pyarrow DataType."""
    if isinstance(t, pa.DataType):
        return t
    if isinstance(t, np.dtype):
        return pa.from_numpy_dtype(t)
    return {str: pa.string(), bytes: pa.binary(), int: pa.int64(),
            float: pa.float64(), bool: pa.bool_(),
            object: pa.string()}[t]


def _flat_union(left, right, left_key: str, right_key: str, n_parts: int):
    """Tag + widen both sides to one flat schema; returns (tagged_ds,
    l_names, r_names, out_schema)."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_fields = [(n, _arrow_type(t))
                for n, t in zip(l_schema.names, l_schema.types)]
    r_fields = [(n, _arrow_type(t))
                for n, t in zip(r_schema.names, r_schema.types)
                if n not in l_schema.names]
    out_schema = pa.schema(l_fields + r_fields)

    def tag(side: int, on: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "part": pa.array(_part_of(batch.column(on), n_parts),
                                 pa.int32()),
                "side": pa.array(np.full(n, side, dtype=np.int8),
                                 pa.int8())}
            mine = set(batch.column_names)
            for name, t in l_fields + r_fields:
                cols[name] = (batch.column(name) if name in mine
                              else pa.nulls(n, t))
            return pa.table(cols)
        return f

    tagged = (left.map_batches(tag(0, left_key), batch_format="pyarrow")
              .union(right.map_batches(tag(1, right_key),
                                       batch_format="pyarrow")))
    return tagged, l_schema.names, list(r_schema.names), out_schema


def _split_sides(group: pa.Table, l_names, r_names):
    sides = np.asarray(group.column("side"))
    lmask = pa.array(sides == 0)
    rmask = pa.array(sides == 1)
    ldf = group.select(l_names).filter(lmask).to_pandas()
    rdf = group.select(r_names).filter(rmask).to_pandas()
    return ldf, rdf


def hash_join(left, right, left_on: str, right_on: str, *,
              n_parts: int = 32, how: str = "inner",
              merge_post=None, post_schema: pa.Schema | None = None):
    """left/right: ray.data.Datasets with disjoint column names.  Returns
    a Dataset with the union of both sides' columns.

    ``merge_post(df) -> df``: optional per-partition post-processing of
    the joined frame (with ``post_schema`` pinning its output).  Because a
    join key's rows are fully co-located in one partition, key-grouped
    aggregation/top-k folded in here is *exact* and removes the second
    shuffle over the raw join output — the partial-within-the-join
    pattern."""
    tagged, l_names, r_names, out_schema = _flat_union(
        left, right, left_on, right_on, n_parts)
    if how in ("anti", "semi") and merge_post is None:
        # existence joins keep only left columns (fields from the flat
        # union schema — already valid pyarrow types)
        out_schema = pa.schema([out_schema.field(n) for n in l_names])
    schema = post_schema if merge_post is not None else out_schema

    def merge(group: pa.Table) -> pa.Table:
        ldf, rdf = _split_sides(group, l_names, r_names)
        if how in ("anti", "semi"):
            # existence check: key membership is exact because the hash
            # partitioning co-locates every occurrence of a key.
            # NOT-EXISTS null semantics: NULL = NULL never matches, so a
            # null left key is never "present" (pandas isin would treat
            # NaN as matching NaN — drop nulls from both sides' keys).
            present = (ldf[left_on].notna()
                       & ldf[left_on].isin(rdf[right_on].dropna().unique()))
            out = ldf[~present] if how == "anti" else ldf[present]
        else:
            out = ldf.merge(rdf, left_on=left_on, right_on=right_on, how=how)
        if merge_post is not None:
            out = merge_post(out)
        out = out[[c for c in schema.names]]
        return _pd_table(out, schema)

    # num_partitions=n_parts: the shuffle's reduce width is the join's
    # partition count, not the accidental input block count — sort-shuffle
    # cost scales with (input blocks x reduce partitions), and letting the
    # reduce default to the block count cost ~4x wall time at small scale
    return tagged.groupby("part", num_partitions=n_parts) \
        .map_groups(merge, batch_format="pyarrow")


def asof_join(left, right, *, left_by: str, right_by: str,
              left_ts: str, right_ts: str, n_parts: int = 32):
    """Backward as-of join: each left row matched to the latest right row
    with ``right_ts <= left_ts`` for the same key.  Partitioning
    assumption: all rows of one key fit one partition group (same
    contract as the hash join; salt hot keys if not)."""
    tagged, l_names, r_names, out_schema = _flat_union(
        left, right, left_by, right_by, n_parts)

    def merge(group: pa.Table) -> pa.Table:
        ldf, rdf = _split_sides(group, l_names, r_names)
        ldf = ldf.sort_values(left_ts, kind="mergesort")
        rdf = rdf.sort_values(right_ts, kind="mergesort")
        out = pd.merge_asof(ldf, rdf, left_on=left_ts, right_on=right_ts,
                            left_by=left_by, right_by=right_by,
                            direction="backward")
        out = out[[c for c in out_schema.names]]
        return _pd_table(out, out_schema)

    return tagged.groupby("part", num_partitions=n_parts) \
        .map_groups(merge, batch_format="pyarrow")

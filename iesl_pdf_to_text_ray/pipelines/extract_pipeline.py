"""The flagship pipeline: PDF corpus table -> interleaved span table.

Ray-Data-native topology (streaming end to end, SURVEY.md §7):

  read_parquet(pending shards, include_paths)       # prune at the read
    -> map_batches(ExtractDocs, actor pool)         # stateful parse stage
    -> groupby(partition_id).map_groups(writer)     # per-partition atomic
                                                    # output + lineage
  (skew path) split_tasks -> map_batches(ExtractShards)
    -> groupby(doc_id).map_groups(reassemble)       # the one ordering shuffle

Resume: completed partitions are anti-joined away from the input file list
before anything is read (state/lineage.py).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

from ..stages.extract import (ExtractDocs, ExtractShards,
                              reassemble_groups, spans_digest, split_tasks)
from ..state import lineage


def _input_shards(corpus_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))


def extract_dataset(corpus_dir_or_ds, *, concurrency=None, batch_size: int = 8,
                    split_pages: bool = False, split_threshold: int | None = None,
                    pages_per_shard: int | None = None):
    """Build the lazy extraction Dataset (no output writing).

    ``split_threshold`` / ``pages_per_shard`` parameterize the skew split
    and are bound into the worker UDF via functools.partial (pickled by
    value — module-global overrides would not reach workers).
    """
    import functools

    import ray.data
    from ..stages import extract as ex
    if concurrency is None:
        concurrency = (1, 8)  # autoscaling actor pool
    threshold = (ex.SPLIT_PAGE_THRESHOLD if split_threshold is None
                 else split_threshold)
    per_shard = (ex.PAGES_PER_SHARD if pages_per_shard is None
                 else pages_per_shard)
    is_dir = isinstance(corpus_dir_or_ds, str)
    if split_pages:
        if is_dir:
            # metadata-only read for the split decision: the payload
            # column never enters the split stage or the doc_id shuffle
            ds = ray.data.read_parquet(_input_shards(corpus_dir_or_ds),
                                       columns=["doc_id", "n_pages"],
                                       include_paths=True)
        else:
            ds = corpus_dir_or_ds
        ds = ds.map_batches(
            functools.partial(split_tasks, threshold=threshold,
                              pages_per_shard=per_shard),
            batch_format="pyarrow", batch_size=batch_size)
        ds = ds.map_batches(ExtractShards, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency)
        ds = ds.groupby("doc_id").map_groups(reassemble_groups,
                                             batch_format="pyarrow")
    else:
        ds = (ray.data.read_parquet(_input_shards(corpus_dir_or_ds))
              if is_dir else corpus_dir_or_ds)
        ds = ds.map_batches(ExtractDocs, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency)
    return ds


def extract_to_dir(corpus_dir: str, out_dir: str, *, concurrency=None,
                   batch_size: int = 8, split_pages: bool = False,
                   split_threshold: int | None = None,
                   pages_per_shard: int | None = None) -> dict:
    """Resumable run: skip completed partitions, write parquet + lineage.

    ``split_pages=True`` routes pathological documents through the
    page-level skew split while keeping per-partition resume: the
    partition id (derived from the input file) rides along the shard rows
    and the doc_id reassembly, so a killed run still skips finished
    partitions."""
    import functools

    import ray.data
    from ..stages import extract as ex
    if concurrency is None:
        concurrency = (1, 8)

    os.makedirs(out_dir, exist_ok=True)
    shards = _input_shards(corpus_dir)
    done = lineage.completed_partitions(out_dir)
    pending = [f for f in shards
               if lineage.partition_id_for(f) not in done]
    stats = {"partitions_total": len(shards),
             "partitions_skipped": len(shards) - len(pending),
             "partitions_run": len(pending)}
    if not pending:
        return stats

    def tag_partition(batch: pa.Table) -> pa.Table:
        pids = [lineage.partition_id_for(p)
                for p in batch.column("path").to_pylist()]
        return batch.append_column("partition_id",
                                   pa.array(pids, pa.string()))

    if split_pages:
        threshold = (ex.SPLIT_PAGE_THRESHOLD if split_threshold is None
                     else split_threshold)
        per_shard = (ex.PAGES_PER_SHARD if pages_per_shard is None
                     else pages_per_shard)
        ds = ray.data.read_parquet(pending, columns=["doc_id", "n_pages"],
                                   include_paths=True)
        ds = ds.map_batches(tag_partition, batch_format="pyarrow")
        ds = ds.map_batches(
            functools.partial(split_tasks, threshold=threshold,
                              pages_per_shard=per_shard),
            batch_format="pyarrow", batch_size=batch_size)
        ds = ds.map_batches(ExtractShards, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency)
        ds = ds.groupby("doc_id").map_groups(reassemble_groups,
                                             batch_format="pyarrow")
    else:
        ds = ray.data.read_parquet(pending, include_paths=True)
        ds = ds.map_batches(
            lambda b: tag_partition(b).drop_columns(["path"]),
            batch_format="pyarrow")
        ds = ds.map_batches(ExtractDocs, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency)

    def write_group_bound(group: pa.Table) -> pa.Table:
        pid = group.column("partition_id")[0].as_py()
        table = group.drop_columns(["partition_id"])
        spans_col = table.column("spans").to_pylist()
        digest = spans_digest([s for row in spans_col for s in row])
        n_docs = table.num_rows
        n_spans = sum(len(r) for r in spans_col)
        n_errors = sum(1 for e in table.column("error").to_pylist() if e)
        lineage.write_partition(out_dir, pid, table,
                                {"n_docs": n_docs, "n_spans": n_spans,
                                 "n_errors": n_errors, "digest": digest})
        return pa.table({"partition_id": pa.array([pid], pa.string()),
                         "n_docs": pa.array([n_docs], pa.int64()),
                         "n_spans": pa.array([n_spans], pa.int64()),
                         "n_errors": pa.array([n_errors], pa.int64())})

    manifest = (ds.groupby("partition_id")
                .map_groups(write_group_bound, batch_format="pyarrow")
                .take_all())
    stats["n_docs"] = sum(r["n_docs"] for r in manifest)
    stats["n_spans"] = sum(r["n_spans"] for r in manifest)
    stats["n_errors"] = sum(r["n_errors"] for r in manifest)
    return stats


def read_output(out_dir: str):
    import ray.data
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    return ray.data.read_parquet(files)


def extract_pdf_dir_ranged(input_dir: str, *, concurrency=None,
                           batch_size: int = 4,
                           split_threshold: int = 0,
                           pages_per_shard: int | None = None):
    """Raw ``*.pdf`` tree -> span table via range reads: the ChunkedStream
    analog (reference pdf.combined.js:4614 ChunkedStream / :49446
    NetworkPdfManager) lifted to the Ray pipeline.  Rows carry only
    (doc_id, path, n_pages); page-range shards open the file through
    ``ChunkedData`` and fetch just the byte ranges their objects live in
    — one multi-GB PDF never resides whole in any actor (peak residency
    = LRU cap + largest object + its shard's decoded pages).

    ``split_threshold=0`` routes every document through the page-split
    path, which is the point of ranged mode; raise it to parse small
    documents whole (still via ChunkedData, still memory-bounded).

    The directory variant is test/CLI convenience: it globs the tree
    on the driver and delegates to ``extract_pdf_manifest_ranged`` —
    the scale path, where the listing is itself a Dataset (e.g.
    ``read_parquet`` of a crawl manifest) and never touches the driver.
    """
    import ray.data

    from ..sources.corpus import relative_doc_path

    paths = sorted(glob.glob(os.path.join(input_dir, "**", "*.pdf"),
                             recursive=True))
    items = [{"doc_id": os.path.splitext(
                  relative_doc_path(p, input_dir))[0],
              "path": p} for p in paths]
    return extract_pdf_manifest_ranged(
        ray.data.from_items(items), concurrency=concurrency,
        batch_size=batch_size, split_threshold=split_threshold,
        pages_per_shard=pages_per_shard)


def extract_pdf_manifest_ranged(manifest, *, concurrency=None,
                                batch_size: int = 4,
                                split_threshold: int = 0,
                                pages_per_shard: int | None = None):
    """Manifest-driven ranged extraction: ``manifest`` is a
    ray.data.Dataset with (doc_id: string, path: string) rows — a
    parquet listing table at real scale, so file enumeration is
    distributed and resumable like everything else; no driver-side
    glob anywhere in the hot path.  Page counting, skew splitting,
    range-read parsing and reassembly are the same stages as the
    directory variant."""
    import functools

    from ..pdf.chunked_data import ChunkedData
    from ..pdf.extractor import count_pages
    from ..stages import extract as ex

    if concurrency is None:
        concurrency = (1, 8)
    per_shard = (ex.PAGES_PER_SHARD if pages_per_shard is None
                 else pages_per_shard)
    ds = manifest

    def add_pages(batch: pa.Table) -> pa.Table:
        # O(1) fetches per file: header + trailer + root /Count chunks
        pages = []
        for p in batch.column("path").to_pylist():
            try:
                pages.append(count_pages(ChunkedData.from_file(p)))
            except Exception:
                pages.append(1)
        return batch.append_column("n_pages",
                                   pa.array(pages, pa.int32()))

    ds = ds.map_batches(add_pages, batch_format="pyarrow",
                        batch_size=batch_size)
    ds = ds.map_batches(
        functools.partial(split_tasks, threshold=split_threshold,
                          pages_per_shard=per_shard),
        batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(ExtractShards, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency)
    return ds.groupby("doc_id").map_groups(reassemble_groups,
                                           batch_format="pyarrow")

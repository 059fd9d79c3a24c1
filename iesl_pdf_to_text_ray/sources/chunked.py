"""Chunked-payload corpus: bounded-size byte-range rows for huge PDFs.

The reference holds document bytes behind a range-chunked stream
(ChunkedStream / NetworkPdfManager, pdf.combined.js:4614, 49446) so a
multi-GB PDF is never one contiguous allocation.  The Ray-Data-native
equivalent is at the *storage* layer: a document's payload is stored as
N bounded chunk rows, so no parquet row / Arrow block / object-store
object ever exceeds ``chunk_bytes`` — the knob that keeps
target_max_block_size honest when single documents are pathological.

Schema (one row per chunk):

    doc_id    : string
    chunk_idx : int32
    n_chunks  : int32
    n_pages   : int32
    chunk     : binary

``read_chunked_corpus`` reassembles to the standard corpus schema with a
groupby(doc_id) shuffle — chunks of a document co-locate, per-task memory
is bounded by the partition's share of documents, and the result feeds
``extract_dataset`` unchanged.  Reassembly is the one place the whole
payload must exist in memory (the parser needs random access for XRef);
documents beyond worker heap go through the page-split pointer path
instead (stages/extract.py), which never materializes whole payloads.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .corpus import CORPUS_SCHEMA

CHUNK_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("chunk_idx", pa.int32()),
    ("n_chunks", pa.int32()),
    ("n_pages", pa.int32()),
    ("chunk", pa.binary()),
])


def chunk_batch(batch: pa.Table, chunk_bytes: int) -> pa.Table:
    """corpus rows -> chunk rows (streaming; no per-doc state)."""
    doc_ids, idxs, totals, pages, payloads = [], [], [], [], []
    for doc_id, blob, n_pages in zip(batch.column("doc_id").to_pylist(),
                                     batch.column("pdf_bytes").to_pylist(),
                                     batch.column("n_pages").to_pylist()):
        n = max(1, -(-len(blob) // chunk_bytes))
        for i in range(n):
            doc_ids.append(doc_id)
            idxs.append(i)
            totals.append(n)
            pages.append(n_pages)
            payloads.append(blob[i * chunk_bytes:(i + 1) * chunk_bytes])
    return pa.table({
        "doc_id": doc_ids,
        "chunk_idx": pa.array(idxs, pa.int32()),
        "n_chunks": pa.array(totals, pa.int32()),
        "n_pages": pa.array(pages, pa.int32()),
        "chunk": pa.array(payloads, pa.binary()),
    }, schema=CHUNK_SCHEMA)


def write_chunked_corpus(corpus_dir: str, out_dir: str, *,
                         chunk_bytes: int = 4 << 20) -> str:
    """Convert a whole-doc corpus into the chunked layout (parquet;
    Lance at production scale — same import gate as read_corpus)."""
    import functools

    import ray.data
    os.makedirs(out_dir, exist_ok=True)
    ds = ray.data.read_parquet(corpus_dir)
    ds = ds.map_batches(functools.partial(chunk_batch,
                                          chunk_bytes=chunk_bytes),
                        batch_format="pyarrow", batch_size=16)
    ds.write_parquet(out_dir)
    return out_dir


def _reassemble(group: pa.Table) -> pa.Table:
    df = group.to_pandas().sort_values(["doc_id", "chunk_idx"],
                                       kind="mergesort")
    out_ids, out_bytes, out_pages = [], [], []
    for doc_id, sub in df.groupby("doc_id", sort=False):
        n = int(sub["n_chunks"].iloc[0])
        if len(sub) != n or list(sub["chunk_idx"]) != list(range(n)):
            raise ValueError(f"{doc_id}: missing/duplicate chunks "
                             f"({len(sub)}/{n})")
        out_ids.append(doc_id)
        out_bytes.append(b"".join(sub["chunk"]))
        out_pages.append(int(sub["n_pages"].iloc[0]))
    return pa.table({
        "doc_id": out_ids,
        "pdf_bytes": pa.array(out_bytes, pa.binary()),
        "n_pages": pa.array(out_pages, pa.int32()),
    }, schema=CORPUS_SCHEMA)


def read_chunked_corpus(path: str, *, n_parts: int | None = None):
    """chunk rows -> corpus-schema Dataset via coarse-partition
    reassembly (part = hash(doc_id): partition-local doc groups are
    complete, so the pandas groupby inside is exact)."""
    import ray.data
    total = sum(os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)) if os.path.isdir(path) else 0
    if n_parts is None:
        n_parts = max(8, total // (64 << 20))
    # size-aware block count (the _read_sized rule): sort-shuffle cost
    # scales with input blocks x reduce partitions, and the default
    # cpu-count split hands a small chunk table 64 near-empty blocks
    # (measured: the reassembly Sort spent 8 s wall on <2 s of work)
    ds = ray.data.read_parquet(
        path, override_num_blocks=max(8, total // (32 << 20)))

    def add_part(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch.column("doc_id").to_pandas().to_numpy(),
            hash_key="0123456789123456")
        return batch.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part", num_partitions=int(n_parts))
            .map_groups(_reassemble, batch_format="pyarrow"))

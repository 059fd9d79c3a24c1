"""Interleaved-spans table operators (the input_hint shape):

    doc_id : string
    spans  : list<struct<kind, text, media_ref, offset>>

``synthesize_spans_ds`` derives a deterministic interleaved table from the
documents table (FIXTURES.md §1 edge cases injected), and
``normalize_spans_batch`` applies the engine's span-normalization contract
(control-char span drop, whitespace-only drop, offset reindex) as a
vectorized batch transform — the same §5.3 rule 5 the extractor enforces.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..sources.corpus import SPAN_STRUCT

_EDGE_TEXTS = ["\x01\x02", "ﬁne", "ö", "–", " lead"]


def synthesize_spans_batch(batch: pa.Table) -> pa.Table:
    """documents row -> interleaved spans row (deterministic).

    Hashing is keyed by *chunk index* (stateless per chunk, md5-based) so
    the span-count statistics are reproducible by the SQL oracle: chunk c
    gets a media span before it iff h(c) % 12 == 0 and an edge-case text
    iff h(c) % 17 == 0 (edge chosen by h % 5)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids, out_spans = [], []
    for doc_id, text in zip(doc_ids, texts):
        toks = (text or "").split()
        spans = []
        media_ctr = 0
        for c, i in enumerate(range(0, len(toks), 5)):
            h = hash_stable(doc_id, c)
            if h % 12 == 0:
                media_ctr += 1
                spans.append({"kind": "media", "text": "",
                              "media_ref": f"img_p{c // 8}_{media_ctr}",
                              "offset": len(spans)})
            txt = " ".join(toks[i:i + 5])
            if h % 17 == 0:
                txt = _EDGE_TEXTS[h % len(_EDGE_TEXTS)]
            spans.append({"kind": "text", "text": txt,
                          "media_ref": "", "offset": len(spans)})
        out_ids.append(str(doc_id))
        out_spans.append(spans)
    return pa.table({"doc_id": pa.array(out_ids, pa.string()),
                     "spans": pa.array(out_spans, pa.list_(SPAN_STRUCT))})


def hash_stable(doc_id, idx: int) -> int:
    """First 4 bytes (big-endian) of md5('<doc_id>:<idx>') — matches the
    oracle's ('0x' || substr(md5(doc_id || ':' || idx), 1, 8))::UBIGINT."""
    import hashlib
    h = hashlib.md5(f"{doc_id}:{idx}".encode()).digest()[:4]
    return int.from_bytes(h, "big")


def normalize_spans_batch(batch: pa.Table) -> pa.Table:
    """Span normalization: drop control-char / whitespace-only text spans,
    reindex offsets; emit per-doc stats."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    out_spans, n_in, n_out, n_media = [], [], [], []
    for spans in spans_col:
        cleaned = []
        for s in spans:
            if s["kind"] == "text":
                t = s["text"]
                if not t or t.isspace() or min(t) < "\x20":
                    continue
            cleaned.append({"kind": s["kind"], "text": s["text"],
                            "media_ref": s["media_ref"],
                            "offset": len(cleaned)})
        out_spans.append(cleaned)
        n_in.append(len(spans))
        n_out.append(len(cleaned))
        n_media.append(sum(1 for s in cleaned if s["kind"] == "media"))
    return pa.table({
        "doc_id": pa.array([str(d) for d in doc_ids], pa.string()),
        "spans": pa.array(out_spans, pa.list_(SPAN_STRUCT)),
        "n_spans_in": pa.array(n_in, pa.int32()),
        "n_spans_out": pa.array(n_out, pa.int32()),
        "n_media": pa.array(n_media, pa.int32())})


def spans_pipeline(sf_dir: str):
    """documents -> synthesize interleaved spans -> normalize -> stats."""
    import ray.data
    from .table_ops import _clean_schema
    path = os.path.join(sf_dir, "documents.parquet")
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"],
                               schema=_clean_schema(path,
                                                    ["doc_id", "text"]))
    ds = ds.map_batches(synthesize_spans_batch, batch_format="pyarrow")
    ds = ds.map_batches(normalize_spans_batch, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_spans_in", "n_spans_out",
                              "n_media"])

"""The extraction stage: stateful actor-pool map_batches over Arrow batches.

One callable-class instance per actor; the static font tables (AGL, Appendix
D encodings, standard-14 metrics — ~10k entries) are loaded once per actor in
``__init__`` (SURVEY.md §4.2), never per batch.  Rows are processed with a
per-row error quarantine: a malformed PDF yields an empty span list and an
``error`` string instead of raising, so one poison document can never kill a
block (the reference has no equivalent; its CLI dies on the first bad file).

Skew handling for pathological multi-hundred-page documents: ``split_tasks``
fans a document out to page-range shards *before* the parse, and
``reassemble_groups`` restores reading order by rebasing each shard's local
span offsets — the one shuffle in the pipeline, keyed by doc_id.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..sources.corpus import SPAN_STRUCT
from ..pdf.extractor import count_pages, extract_spans

SPLIT_PAGE_THRESHOLD = 64   # docs beyond this get page-level fan-out
PAGES_PER_SHARD = 16

_OUT_FIELDS = [
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
    ("n_spans", pa.int32()),
    ("n_text", pa.int32()),
    ("n_media", pa.int32()),
    ("error", pa.string()),
]
OUT_SCHEMA = pa.schema(_OUT_FIELDS)


def _span_rows(spans):
    return [{"kind": k, "text": t, "media_ref": m, "offset": o}
            for k, t, m, o in spans]


class ExtractDocs:
    """map_batches(ExtractDocs, batch_format='pyarrow', concurrency=N)."""

    def __init__(self):
        # warm the per-actor static tables once (font data JSON)
        from ..pdf import fonts
        fonts.glyph_list()
        fonts.encodings()
        fonts.std_fonts()
        fonts.metrics()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("pdf_bytes").to_pylist()
        out = {name: [] for name, _ in _OUT_FIELDS}
        for doc_id, data in zip(doc_ids, payloads):
            try:
                spans = extract_spans(data)
                err = ""
            except Exception as e:  # per-row quarantine
                spans = []
                err = f"{type(e).__name__}: {e}"[:500]
            out["doc_id"].append(doc_id)
            out["spans"].append(_span_rows(spans))
            out["n_spans"].append(len(spans))
            out["n_text"].append(sum(1 for s in spans if s[0] == "text"))
            out["n_media"].append(sum(1 for s in spans if s[0] == "media"))
            out["error"].append(err)
        cols = {"doc_id": pa.array(out["doc_id"], pa.string()),
                "spans": pa.array(out["spans"], pa.list_(SPAN_STRUCT)),
                "n_spans": pa.array(out["n_spans"], pa.int32()),
                "n_text": pa.array(out["n_text"], pa.int32()),
                "n_media": pa.array(out["n_media"], pa.int32()),
                "error": pa.array(out["error"], pa.string())}
        if "partition_id" in batch.column_names:
            cols["partition_id"] = batch.column("partition_id")
        return pa.table(cols)


# ---- page-level skew splitting ---------------------------------------------

def split_tasks(batch: pa.Table) -> pa.Table:
    """flat_map-style: doc row -> one or more (doc_id, shard, page range) rows.

    Output keeps the pdf_bytes payload per shard row; at 100 TB the payload
    column is a Lance-backed lazy reference, so the duplication cost is a
    pointer, not a copy (object-store dedup also interns identical blobs).
    """
    doc_ids = batch.column("doc_id").to_pylist()
    payloads = batch.column("pdf_bytes").to_pylist()
    n_pages_col = (batch.column("n_pages").to_pylist()
                   if "n_pages" in batch.column_names
                   else [None] * len(doc_ids))
    out = {"doc_id": [], "shard": [], "page_start": [], "page_end": [],
           "pdf_bytes": []}
    for doc_id, data, n_pages in zip(doc_ids, payloads, n_pages_col):
        if n_pages is None:
            try:
                n_pages = count_pages(data)
            except Exception:
                n_pages = 1
        if n_pages <= SPLIT_PAGE_THRESHOLD:
            shards = [(0, n_pages)]
        else:
            shards = [(s, min(s + PAGES_PER_SHARD, n_pages))
                      for s in range(0, n_pages, PAGES_PER_SHARD)]
        for i, (a, b) in enumerate(shards):
            out["doc_id"].append(doc_id)
            out["shard"].append(i)
            out["page_start"].append(a)
            out["page_end"].append(b)
            out["pdf_bytes"].append(data)
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.string()),
        "shard": pa.array(out["shard"], pa.int32()),
        "page_start": pa.array(out["page_start"], pa.int32()),
        "page_end": pa.array(out["page_end"], pa.int32()),
        "pdf_bytes": pa.array(out["pdf_bytes"], pa.binary())})


class ExtractShards:
    """Extract page-range shards (post split_tasks)."""

    def __init__(self):
        from ..pdf import fonts
        fonts.glyph_list()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "shard": [], "spans": [], "error": []}
        for row in batch.to_pylist():
            try:
                spans = extract_spans(row["pdf_bytes"],
                                      (row["page_start"], row["page_end"]))
                err = ""
            except Exception as e:
                spans, err = [], f"{type(e).__name__}: {e}"[:500]
            out["doc_id"].append(row["doc_id"])
            out["shard"].append(row["shard"])
            out["spans"].append(_span_rows(spans))
            out["error"].append(err)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "shard": pa.array(out["shard"], pa.int32()),
            "spans": pa.array(out["spans"], pa.list_(SPAN_STRUCT)),
            "error": pa.array(out["error"], pa.string())})


def reassemble_groups(group: pa.Table) -> pa.Table:
    """groupby(doc_id).map_groups: order shards, rebase offsets, concat."""
    rows = sorted(group.to_pylist(), key=lambda r: r["shard"])
    doc_id = rows[0]["doc_id"]
    spans: list[dict] = []
    errors = [r["error"] for r in rows if r["error"]]
    for r in rows:
        for s in r["spans"]:
            spans.append({"kind": s["kind"], "text": s["text"],
                          "media_ref": s["media_ref"],
                          "offset": len(spans)})
    return pa.table({
        "doc_id": pa.array([doc_id], pa.string()),
        "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
        "n_spans": pa.array([len(spans)], pa.int32()),
        "n_text": pa.array([sum(1 for s in spans if s["kind"] == "text")],
                           pa.int32()),
        "n_media": pa.array([sum(1 for s in spans if s["kind"] == "media")],
                            pa.int32()),
        "error": pa.array(["; ".join(errors)], pa.string())})


def spans_digest(spans: list[dict]) -> str:
    h = hashlib.sha256()
    for s in spans:
        h.update(s["kind"].encode())
        h.update(s["text"].encode())
        h.update(s["media_ref"].encode())
    return h.hexdigest()[:16]

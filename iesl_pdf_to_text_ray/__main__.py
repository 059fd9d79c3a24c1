"""CLI: PDF(s) -> interleaved span output.

Surface parity with the reference CLI (src/main/js/cli.js:9-26: -i/-o/-p/-f)
re-expressed for the span data model: one PDF or a directory in, JSONL or
parquet spans out, optional per-page grouping and metadata/plain-text dumps.

    python -m iesl_pdf_to_text_ray -i doc.pdf -o out.jsonl
    python -m iesl_pdf_to_text_ray -i pdfs/ -o spans/ -f parquet --ray
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _iter_inputs(path: str):
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.lower().endswith(".pdf"):
                yield os.path.join(path, name)
    else:
        yield path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="iesl_pdf_to_text_ray")
    ap.add_argument("-i", "--input", required=True,
                    help="PDF file or directory of PDFs")
    ap.add_argument("-o", "--output", default="-",
                    help="output file/dir ('-' = stdout)")
    ap.add_argument("-f", "--format",
                    choices=["jsonl", "parquet", "text", "svg"],
                    default="jsonl")
    ap.add_argument("-p", "--per-page", action="store_true",
                    help="emit one record per page instead of per document")
    ap.add_argument("--metadata", action="store_true",
                    help="include document metadata in each record")
    ap.add_argument("--ray", action="store_true",
                    help="run as a Ray Data pipeline (directories)")
    args = ap.parse_args(argv)

    from .pdf.extractor import (count_pages, extract_metadata, extract_spans,
                                extract_plain_text, extract_svg)

    if args.format == "svg":
        # reference CLI product parity: one SVG per document (cli.js), or
        # one per page with -p (node/pdf2svg.js svgdump)
        out_dir = args.output if args.output != "-" else "."
        os.makedirs(out_dir, exist_ok=True)
        for path in _iter_inputs(args.input):
            doc_id = os.path.splitext(os.path.basename(path))[0]
            data = open(path, "rb").read()
            if args.per_page:
                for p in range(count_pages(data)):
                    svg = extract_svg(data, (p, p + 1))
                    with open(os.path.join(out_dir,
                                           f"{doc_id}-p{p}.svg"), "w") as f:
                        f.write(svg)
            else:
                with open(os.path.join(out_dir, f"{doc_id}.svg"), "w") as f:
                    f.write(extract_svg(data))
        return 0

    def record(path: str) -> list[dict]:
        doc_id = os.path.splitext(os.path.basename(path))[0]
        data = open(path, "rb").read()
        if args.format == "text":
            return [{"doc_id": doc_id, "text": extract_plain_text(data)}]
        out = []
        if args.per_page:
            n = count_pages(data)
            for p in range(n):
                spans = extract_spans(data, (p, p + 1))
                out.append({"doc_id": doc_id, "page": p, "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o,
                     "x": xs, "y": y}
                    for k, t, m, o, xs, y, *_ in spans]})
        else:
            spans = extract_spans(data)
            out.append({"doc_id": doc_id, "spans": [
                {"kind": k, "text": t, "media_ref": m, "offset": o,
                 "x": xs, "y": y, "page": pg, "mat": mt}
                for k, t, m, o, xs, y, pg, mt in spans]})
        if args.metadata:
            meta = extract_metadata(data)
            for r in out:
                r["metadata"] = meta
        return out

    if not os.path.exists(args.input):
        print(f"error: input not found: {args.input}", file=sys.stderr)
        return 2
    inputs = list(_iter_inputs(args.input))
    if not inputs:
        print(f"no PDFs found under {args.input}", file=sys.stderr)
        return 2

    if args.ray and os.path.isdir(args.input):
        # the real scale pipeline: raw file tree -> streaming Dataset ->
        # actor-pool extraction (whole-doc path; page-level skew split is
        # exercised via extract_dataset(split_pages=True) in the driver's
        # extract_corpus_split query) -> sink
        import ray
        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False)
        from .pipelines.extract_pipeline import extract_dataset
        from .sources.corpus import read_pdf_files
        ds = extract_dataset(read_pdf_files(args.input), split_pages=False)
        if args.format == "parquet":
            ds.write_parquet(args.output)
            ray.shutdown()
            return 0
        # jsonl: stream batches to the sink — constant driver memory, the
        # corpus never materializes on this side of the object store
        sink = sys.stdout if args.output == "-" else open(args.output, "w")
        for batch in ds.iter_batches(batch_size=64, batch_format="pyarrow"):
            for r in batch.select(["doc_id", "spans", "error"]).to_pylist():
                sink.write(json.dumps(r, ensure_ascii=False) + "\n")
        if sink is not sys.stdout:
            sink.close()
        ray.shutdown()
        return 0
    rows = [r for p in inputs for r in record(p)]

    if args.format == "parquet":
        import pandas as pd
        pd.DataFrame(rows).to_parquet(args.output)
        return 0
    sink = sys.stdout if args.output == "-" else open(args.output, "w")
    for r in rows:
        sink.write(json.dumps(r, ensure_ascii=False) + "\n")
    if sink is not sys.stdout:
        sink.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

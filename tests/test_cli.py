"""CLI surface tests (reference cli.js parity: -i/-o/-p/-f)."""

from __future__ import annotations

import json
import subprocess
import sys

PDF = "/root/reference/src/test/resources/input/1301.4293.pdf"


def run_cli(*args):
    return subprocess.run([sys.executable, "-m", "iesl_pdf_to_text_ray",
                           *args], capture_output=True, text=True,
                          cwd="/root/repo")


def test_jsonl_output(tmp_path):
    out = tmp_path / "o.jsonl"
    r = run_cli("-i", PDF, "-o", str(out))
    assert r.returncode == 0, r.stderr
    rec = json.loads(out.read_text())
    assert rec["doc_id"] == "1301.4293"
    texts = [s for s in rec["spans"] if s["kind"] == "text"]
    assert len(texts) == 569


def test_per_page(tmp_path):
    out = tmp_path / "p.jsonl"
    r = run_cli("-i", PDF, "-o", str(out), "-p")
    assert r.returncode == 0, r.stderr
    pages = [json.loads(l) for l in out.read_text().splitlines()]
    assert [p["page"] for p in pages] == [0, 1, 2, 3]
    total_text = sum(1 for p in pages for s in p["spans"]
                     if s["kind"] == "text")
    assert total_text == 569


def test_text_format():
    r = run_cli("-i", PDF, "-f", "text")
    assert r.returncode == 0
    assert "Latent Relation Representations" in r.stdout


def test_missing_input_is_clean():
    r = run_cli("-i", "/nonexistent.pdf")
    assert r.returncode == 2
    assert "not found" in r.stderr


def test_cli_ray_parquet_sink(tmp_path):
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from iesl_pdf_to_text_ray.sources.corpus import reference_pdf_bytes
    src = tmp_path / "pdfs"
    src.mkdir()
    (src / "one.pdf").write_bytes(reference_pdf_bytes()["1301.4293"])
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "iesl_pdf_to_text_ray", "-i", str(src),
         "-o", str(out), "-f", "parquet", "--ray"],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()[-800:]
    t = pq.read_table(str(out))
    assert t.num_rows == 1
    row = t.to_pylist()[0]
    assert row["doc_id"] == "one" and row["error"] == ""
    assert sum(1 for s in row["spans"] if s["kind"] == "text") == 569

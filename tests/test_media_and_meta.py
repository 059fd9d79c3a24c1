"""Multimodal stage plumbing + metadata/plain-text entry points."""

from __future__ import annotations

import pyarrow as pa

from iesl_pdf_to_text_ray.stages.media import (DecodeImageStage,
                                               FrameSampleStage, MediaCodec,
                                               NotImplementedCodec,
                                               synthesize_media_table)


def test_media_table_deterministic():
    a = synthesize_media_table(16)
    b = synthesize_media_table(16)
    assert a.equals(b)
    assert a.schema.field("payload").type == pa.binary()


def test_decode_stage_schema_and_quarantine(ray_session):
    import ray.data
    t = synthesize_media_table(24)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(DecodeImageStage, batch_format="pyarrow",
                         batch_size=8, concurrency=2).take_all()
    assert len(out) == 24
    for r in out:
        assert r["error"] == ""
        assert r["width"] >= 64 and r["height"] >= 64
        assert len(r["feature"]) == 3
        assert len(r["thumbnail"]) == 16 * 16 * 3


def test_not_implemented_codec_quarantines(ray_session):
    import ray.data
    t = synthesize_media_table(6)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(DecodeImageStage,
                         fn_constructor_args=(NotImplementedCodec(),),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=1).take_all()
    assert all(r["error"].startswith("NotImplementedError") for r in out)
    assert all(r["width"] == 0 for r in out)


def test_frame_sampling(ray_session):
    import ray.data
    t = synthesize_media_table(8)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                         batch_size=4, concurrency=1).take_all()
    assert len(out) == 8 * 4
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_metadata_extraction():
    from iesl_pdf_to_text_ray.pdf.extractor import extract_metadata
    data = open("/root/reference/src/test/resources/input/1301.4293.pdf",
                "rb").read()
    m = extract_metadata(data)
    assert m["n_pages"] == 4
    assert "Ghostscript" in m["producer"]
    assert m["has_xmp_metadata"] is True


def test_plain_text():
    from iesl_pdf_to_text_ray.pdf.extractor import extract_plain_text
    data = open("/root/reference/src/test/resources/input/1301.4293.pdf",
                "rb").read()
    t = extract_plain_text(data)
    assert t.startswith("arXiv:1301.4293v2")
    assert "Latent Relation Representations" in t

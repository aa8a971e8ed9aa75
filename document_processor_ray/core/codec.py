"""Synthetic media codec (SPEC.md §5) — the warm "engine" a parse actor holds.

Stands in for the reference's Docling/EasyOCR/TableFormer model stack
(``app/services/dl_converter.py:26-95``): decode = layout/OCR model inference,
canonical re-encode = the deterministic screenshot re-encoding of
``app/services/content_extractor/image_extractor.py:42-64``. Real engines plug in
behind the same interface on machines that have them; the Ray plumbing (actor pools,
batch sizes, content-addressed media refs) does not change.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from dataclasses import dataclass

IMG_MAGIC = b"SIMG1\0"
TBL_MAGIC = b"STBL1\0"
ENC_IMG_MAGIC = b"EIMG1\0"
ENC_TBL_MAGIC = b"ETBL1\0"


class CodecError(ValueError):
    pass


@dataclass
class DecodedImage:
    width: int
    height: int
    text: str  # embedded (OCR-recoverable) text


@dataclass
class DecodedTable:
    rows: list  # list[list[str|int|None]], headers row first


def encode_image(width: int, height: int, text: str) -> bytes:
    return IMG_MAGIC + struct.pack("<II", width, height) + zlib.compress(text.encode("utf-8"))


def encode_table(rows: list) -> bytes:
    return TBL_MAGIC + zlib.compress(json.dumps(rows).encode("utf-8"))


def decode_payload(data: bytes) -> DecodedImage | DecodedTable:
    try:
        if data[:6] == IMG_MAGIC:
            w, h = struct.unpack("<II", data[6:14])
            return DecodedImage(w, h, zlib.decompress(data[14:]).decode("utf-8"))
        if data[:6] == TBL_MAGIC:
            rows = json.loads(zlib.decompress(data[6:]).decode("utf-8"))
            if not isinstance(rows, list):
                raise CodecError("table payload is not a list")
            return DecodedTable(rows)
    except CodecError:
        raise
    except Exception as exc:  # zlib / struct / json / unicode errors → corrupt payload
        raise CodecError(str(exc)) from exc
    raise CodecError("unknown payload magic")


def reencode(decoded: DecodedImage | DecodedTable, clean) -> bytes:
    """Canonical deterministic re-encode; ``clean`` is the N1 scalar cleaner."""
    if isinstance(decoded, DecodedImage):
        return (
            ENC_IMG_MAGIC
            + struct.pack("<II", decoded.width, decoded.height)
            + zlib.compress(clean(decoded.text).encode("utf-8"), 9)
        )
    cleaned = [
        [clean(c) if isinstance(c, str) else c for c in row] for row in decoded.rows
    ]
    blob = json.dumps(cleaned, separators=(",", ":"), ensure_ascii=True).encode("utf-8")
    return ENC_TBL_MAGIC + zlib.compress(blob, 9)


def media_ref_of(canonical: bytes) -> str:
    return "media://" + hashlib.sha256(canonical).hexdigest()[:16]


def ocr_text(decoded: DecodedImage | DecodedTable) -> str:
    """Full-OCR engine output for a payload (SPEC.md §5)."""
    if isinstance(decoded, DecodedImage):
        return decoded.text
    return " ".join(
        str(c) for row in decoded.rows for c in row if c is not None and str(c) != ""
    )

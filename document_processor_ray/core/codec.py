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
ENC_IMG_RAW_MAGIC = b"EIMGR\0"  # "synth-raw" image container (no compression)
ENC_PAGE_MAGIC = b"EPAG1\0"     # synthetic page-screenshot render (SPEC §7, I1)

# I3 analog (reference image_extractor.py:42-64 + api.py:77-79: JPEG/PNG/WEBP
# format + quality knobs). The synth codec exposes the same config surface:
# an output container per format name, and quality = compression level.
FORMATS = ("synth-z", "synth-raw")
DEFAULT_FORMAT = "synth-z"
DEFAULT_QUALITY = 9


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


def reencode(decoded: DecodedImage | DecodedTable, clean,
             fmt: str = DEFAULT_FORMAT, quality: int = DEFAULT_QUALITY,
             scale: int = 1) -> bytes:
    """Deterministic re-encode; ``clean`` is the N1 scalar cleaner. The
    defaults produce the CANONICAL encoding of SPEC §5 (which the equality
    invariant and content-addressed refs assume); ``fmt``/``quality``/``scale``
    are the I3 config surface — non-default values yield different (still
    deterministic, still content-addressed) bytes, exactly like choosing
    JPEG-vs-PNG, a quality level, or the reference's 2-3x ``image_scale``
    render multiplier (``api.py:80``, ``content_extractor.py:31``). Format and
    scale apply to images (as in the reference); tables always use the ETBL
    container but honor ``quality``."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown media format {fmt!r}; known: {FORMATS}")
    if scale < 1:
        raise ValueError(f"media scale must be >= 1 (got {scale})")
    if isinstance(decoded, DecodedImage):
        payload = clean(decoded.text).encode("utf-8")
        dims = struct.pack("<II", decoded.width * scale, decoded.height * scale)
        if fmt == "synth-raw":
            return ENC_IMG_RAW_MAGIC + dims + payload
        return ENC_IMG_MAGIC + dims + zlib.compress(payload, quality)
    cleaned = [
        [clean(c) if isinstance(c, str) else c for c in row] for row in decoded.rows
    ]
    blob = json.dumps(cleaned, separators=(",", ":"), ensure_ascii=True).encode("utf-8")
    return ENC_TBL_MAGIC + zlib.compress(blob, quality)


def decode_canonical(data: bytes) -> DecodedImage | DecodedTable:
    """Decode a re-encoded (canonical or configured) blob — round-trip seam."""
    try:
        if data[:6] == ENC_IMG_MAGIC:
            w, h = struct.unpack("<II", data[6:14])
            return DecodedImage(w, h, zlib.decompress(data[14:]).decode("utf-8"))
        if data[:6] == ENC_IMG_RAW_MAGIC:
            w, h = struct.unpack("<II", data[6:14])
            return DecodedImage(w, h, data[14:].decode("utf-8"))
        if data[:6] == ENC_TBL_MAGIC:
            return DecodedTable(json.loads(zlib.decompress(data[6:]).decode("utf-8")))
    except Exception as exc:
        raise CodecError(str(exc)) from exc
    raise CodecError("unknown canonical magic")


def media_ref_of(canonical: bytes) -> str:
    return "media://" + hashlib.sha256(canonical).hexdigest()[:16]


PAGE_W, PAGE_H = 612, 792


def encode_page_render(doc_id: str, page_no: int) -> bytes:
    """Synthetic per-page screenshot blob (SPEC §7; I1 analog — the reference
    emits one screenshot per Page, page_extractor.py:51-61). Deterministic and
    content-addressable like every other media blob."""
    return (ENC_PAGE_MAGIC + struct.pack("<II", PAGE_W, PAGE_H)
            + zlib.compress(f"{doc_id}\0{page_no}".encode("utf-8"), 9))


def ocr_text(decoded: DecodedImage | DecodedTable) -> str:
    """Full-OCR engine output for a payload (SPEC.md §5)."""
    if isinstance(decoded, DecodedImage):
        return decoded.text
    return " ".join(
        str(c) for row in decoded.rows for c in row if c is not None and str(c) != ""
    )

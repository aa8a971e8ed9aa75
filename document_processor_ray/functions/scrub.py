"""PII-style text scrubbing (redaction) — a standard pre-training hygiene pass.

All patterns are RE2-safe and shared VERBATIM with the DuckDB oracle: both
pyarrow.compute (``replace_substring_regex`` / ``count_substring_regex``) and
DuckDB (``regexp_replace(..., 'g')`` / ``regexp_extract_all``) run Google RE2,
so replace/count semantics match exactly and the query is cross-engine
hash-checkable.

Rule order is part of the contract: each rule counts matches on the text AS
LEFT BY the previous rule, then replaces — so an email's digits are never
double-counted by the long-number rule. The SQL mirror nests
``regexp_replace`` / ``regexp_extract_all`` in the same order.

Scale notes: the whole pass is per-row independent (shuffle-free) and runs as
C-level RE2 kernels over Arrow string arrays inside ``map_batches`` — no Python
per row, no state, nothing on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_PAT = r"\b\d{7,}\b"

# (count_column, RE2 pattern, replacement token) — applied in this order.
SCRUB_RULES = [
    ("n_email", EMAIL_PAT, "<EMAIL>"),
    ("n_ip", IPV4_PAT, "<IP>"),
    ("n_num", LONGNUM_PAT, "<NUM>"),
]


def _col(tbl: pa.Table, name: str) -> pa.Array:
    c = tbl[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def scrub_batch(tbl: pa.Table, text_col: str = "text",
                out_col: str = "scrubbed") -> pa.Table:
    """Apply SCRUB_RULES sequentially; append per-rule int64 counts + out_col."""
    cur = _col(tbl, text_col)
    out = tbl
    for name, pat, rep in SCRUB_RULES:
        n = pc.cast(pc.count_substring_regex(cur, pattern=pat), pa.int64())
        out = out.append_column(name, n)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=rep)
    return out.append_column(out_col, cur)


def augment_contact(tbl: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text",
                    out_col: str = "aug_text") -> pa.Table:
    """Deterministic contact-info augmentation keyed on id_col.

    The synthetic corpus carries no digits at all, so to exercise the scrub
    rules the query appends ``' contact user<id>@example.com from
    10.<id%256>.0.<id%100> acct <100000000+id>'`` — pure integer/string
    concatenation, reproduced token-for-token in the SQL mirror
    (``CAST(doc_id AS VARCHAR)`` ≡ Python/Arrow int→string)."""
    ids = _col(tbl, id_col)
    idn = ids.to_numpy()
    parts = [
        _col(tbl, text_col),
        " contact user", pc.cast(ids, pa.string()),
        "@example.com from 10.",
        pc.cast(pa.array(idn % 256), pa.string()),
        ".0.",
        pc.cast(pa.array(idn % 100), pa.string()),
        " acct ",
        pc.cast(pa.array(idn + 100000000), pa.string()),
    ]
    joined = pc.binary_join_element_wise(*parts, "")
    return tbl.append_column(out_col, joined)

"""Storage seam: Lance when available, parquet-fragment directories otherwise
(SURVEY §7.0).

The north rule names Lance tables as the corpus format. ``lance`` is not
installed in this sandbox, so ``read_docs``/``write_docs`` dispatch on
availability: identical schema, identical fragment-directory layout, so all
pipeline code is storage-agnostic and flips to Lance transparently where the
package exists.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

try:  # pragma: no cover - lance is absent in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def is_lance_uri(uri: str) -> bool:
    return uri.endswith(".lance") or os.path.isdir(os.path.join(uri, "_versions"))


def read_docs(uri: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Dataset over a document table: Lance dataset dir or parquet fragment dir."""
    if HAVE_LANCE and is_lance_uri(uri):
        return rd.read_lance(uri, columns=columns, **kw)
    if os.path.isdir(uri):
        paths = sorted(glob.glob(os.path.join(uri, "*.parquet")))
        return rd.read_parquet(paths, columns=columns, **kw)
    return rd.read_parquet(uri, columns=columns, **kw)


def write_docs(ds: rd.Dataset, uri: str, **kw) -> None:
    if HAVE_LANCE and uri.endswith(".lance"):
        ds.write_lance(uri, **kw)
        return
    ds.write_parquet(uri, **kw)

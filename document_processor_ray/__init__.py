"""Ray-Data-native main-content extraction engine.

A from-scratch re-expression of the extraction semantics of
``joanfabregat/document-processor`` (reference at /root/reference, a single-process
FastAPI PDF→structured-slices microservice) as a streaming Ray Data pipeline over
interleaved text+media span documents, plus the large-scale training-data operators
(dedup, similarity search, text analysis, windowed aggregates) such an engine needs
at 10^12-document scale.

Semantics spec: docs/SPEC.md. Blueprint: SURVEY.md.
"""

__version__ = "0.1.0"


def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable without aiohttp.

    Ray's path resolution re-imports that module on EVERY read/write setup
    (``ray.data.datasource.path_util._is_http_filesystem``); with aiohttp absent
    the import fails each time and is retried, so two concurrent plan setups
    (e.g. run_extraction's threaded branch writes) race on the partially
    executed module and crash with ``cannot import name 'HTTPFileSystem'``.
    Registering a cached sentinel module makes the import succeed exactly once
    and stay in sys.modules; the sentinel class is never instantiated here
    (no HTTP filesystems in this sandbox)."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel only — aiohttp is not installed
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()

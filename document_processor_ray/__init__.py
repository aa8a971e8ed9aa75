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

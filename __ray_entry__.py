"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator (see
``document_processor_ray/pipelines/queries.py`` for the registry and
``SURVEY.md §2`` for the inventory). Ray is initialised by the driver before this
module is imported — nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

from document_processor_ray.pipelines.queries import QUERIES


def entry() -> Any:
    """Flagship pipeline: interleaved corpus derived from sf0.001 documents →
    sniff → HTML-strip → HYBRID parse cascade → ordered span assembly."""
    return QUERIES["extract_flagship"][0]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}

"""Operator modules; importing this package registers every query."""

from . import (  # noqa: F401
    aggregates,
    ingest_ops,
    joins,
    relational,
    scalars,
    scans,
    streaming,
    udfs,
    windows,
)

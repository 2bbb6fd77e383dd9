"""Operator modules; importing this package registers every query."""

from . import (  # noqa: F401
    aggregates,
    catalog_ops,
    dedup,
    flow,
    ingest_ops,
    joins,
    relational,
    scalars,
    scans,
    similarity,
    spark4_ops,
    stream_source,
    streaming,
    textops,
    tpch,
    multimodal,
    udfs,
    windows,
)

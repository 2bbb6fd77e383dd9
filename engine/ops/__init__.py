"""Operator modules; importing this package registers every query."""

from . import (  # noqa: F401
    aggregates,
    joins,
    relational,
    scalars,
    scans,
    udfs,
    windows,
)

"""Operator modules; importing this package registers every query."""

from . import aggregates, joins, relational, scans  # noqa: F401

"""Operator modules; importing this package registers every query."""

from . import aggregates, scans  # noqa: F401

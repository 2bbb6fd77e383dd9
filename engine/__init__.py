"""PySpark-native analytics engine (SURVEY.md is the blueprint).

Importing :mod:`engine` registers the full operator inventory in
:mod:`engine.registry`; ``__spark_entry__`` exposes it to the driver.
"""

from . import ops  # noqa: F401  (side effect: query registration)
from .registry import ORACLES, QUERIES, table  # noqa: F401

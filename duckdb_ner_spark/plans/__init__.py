from .registry import ORACLES, QUERIES, declared  # noqa: F401

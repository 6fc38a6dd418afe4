from .registry import QUERIES, ORACLES, QuerySpec, register

__all__ = ["QUERIES", "ORACLES", "QuerySpec", "register"]

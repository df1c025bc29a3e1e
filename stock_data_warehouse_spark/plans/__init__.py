from .registry import QUERIES, ORACLES, register, query_fns, oracle_map  # noqa: F401

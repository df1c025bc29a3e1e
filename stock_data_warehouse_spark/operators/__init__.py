from .joins import resolve_alias, asof_join  # noqa: F401
from .aggregates import ttm_top_k_sum, latest_row, last_non_null  # noqa: F401

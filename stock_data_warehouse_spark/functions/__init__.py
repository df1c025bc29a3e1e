from .scalars import (  # noqa: F401
    normalize_ticker,
    canonicalize_line,
    coalesce_positive,
    guarded_ratio,
    fallback_cascade,
    fx_pair,
    scale_pct,
    round2,
)
from .classify import classify_sector, clamp_growth, sanitize_beta  # noqa: F401

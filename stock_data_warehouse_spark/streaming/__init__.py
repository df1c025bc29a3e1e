"""Structured Streaming jobs (OP-T1/T3/T7/T8) — see ``jobs``."""

from . import jobs  # noqa: F401

"""The reference pipeline's Spark shape — see ``refresh``."""

from .refresh import refresh_warehouse  # noqa: F401

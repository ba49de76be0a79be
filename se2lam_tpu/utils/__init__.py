"""Utilities: timing/observability."""
from .timing import StageTimer, WorkTimer  # noqa: F401

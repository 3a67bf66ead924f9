"""Named logical plans (queries) + the driver-facing registry."""

from .registry import Query, all_queries, query  # noqa: F401

"""Operator surface (SURVEY.md §2 Part B) — importing this package populates
the query/oracle registries in ``registry``."""

from __future__ import annotations

import importlib

from bossarrowstorageengine_spark.operators.registry import ORACLES, QUERIES

#: Operator-family modules; each registers its queries on import.
_MODULES = [
    "aggregates",
    "event_time",
    "filters",
    "joins",
    "llm_pipeline",
    "multimodal",
    "reshape",
    "scalar_funcs",
    "scans",
    "setops",
    "sorts",
    "subqueries",
    "udfs",
    "windows",
]

for _m in _MODULES:
    importlib.import_module(f"bossarrowstorageengine_spark.operators.{_m}")

__all__ = ["QUERIES", "ORACLES"]

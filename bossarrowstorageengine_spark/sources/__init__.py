"""Custom data sources — the storage-engine identity of this project
(the reference is an *Arrow-format storage engine* plugin; SURVEY.md §0).
"""

from bossarrowstorageengine_spark.sources.arrowipc import (
    ArrowIPCDataSource,
    register_arrowipc,
    register_arrowipc_table,
)

__all__ = ["ArrowIPCDataSource", "register_arrowipc", "register_arrowipc_table"]

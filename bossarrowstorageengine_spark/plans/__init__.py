"""Plan-shaping helpers for the 100 TB design point."""

from bossarrowstorageengine_spark.plans.hints import (
    broadcast_if_small,
    fan_out,
    salted_join,
    scale_conf,
)

__all__ = ["broadcast_if_small", "fan_out", "salted_join", "scale_conf"]

"""Engine wrapper — the reference's engine contract on a SparkSession.

Honors the five guarantees of the reference (SURVEY.md §1.2, citations to
``/root/reference/Source/BOSSArrowStorageEngine.cpp``):

- C1 total evaluation / reified errors (``.cpp:30-39``): ``evaluate`` never
  raises; failures come back as an ``EngineError`` value inside the result.
- C2 pass-through (``.cpp:32``): a payload the engine has no handler for is
  returned unchanged.
- C3 serialized evaluation (``.cpp:52-56``): an ``RLock`` admits one
  evaluation at a time per engine object.
- C4 explicit lifecycle (``.cpp:44-50,59``): ``reset()`` drops all registered
  state (temp views + cache); the engine lazily re-initializes.
- C5 input immutability: Spark plans are immutable by construction; we never
  mutate a caller's DataFrame.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from bossarrowstorageengine_spark import catalog
from bossarrowstorageengine_spark.session import apply_engine_conf, build_session


@dataclass(frozen=True)
class EngineError:
    """Reified evaluation error — the analogue of the reference's
    ``ErrorWhenEvaluatingExpression(expr, message)`` value
    (``/root/reference/Source/BOSSArrowStorageEngine.cpp:34-38``)."""

    payload: Any
    message: str
    exception_type: str


@dataclass(frozen=True)
class EngineResult:
    """Total-function result: exactly one of ``value`` / ``error`` is set."""

    value: Any = None
    error: EngineError | None = None

    @property
    def ok(self) -> bool:
        return self.error is None


class Engine:
    """One engine object per SparkSession (reference guarantee A5/C4)."""

    def __init__(self, spark: SparkSession | None = None,
                 sf_dir: str = catalog.DEFAULT_SF_DIR):
        self._lock = threading.RLock()
        self._spark = spark
        self._sf_dir = sf_dir
        self._initialized = False

    # -- lifecycle ---------------------------------------------------------
    @property
    def spark(self) -> SparkSession:
        self._ensure_init()
        return self._spark

    def _ensure_init(self) -> None:
        if not self._initialized:
            if self._spark is None:
                self._spark = build_session()
            else:
                apply_engine_conf(self._spark)
            catalog.register_views(self._spark, self._sf_dir)
            self._initialized = True

    def reset(self) -> None:
        """C4: destroy engine state; lazily re-init on next call
        (reference ``reset()`` at ``.cpp:59``)."""
        with self._lock:
            if self._spark is not None and self._initialized:
                self._spark.catalog.clearCache()
                for name in catalog.TABLES:
                    self._spark.catalog.dropTempView(name)
            self._initialized = False

    # -- evaluation --------------------------------------------------------
    def evaluate(self, payload: Any) -> EngineResult:
        """C1+C2+C3: total, serialized evaluation.

        Handled payload shapes:
        - callable ``f(spark) -> value``  → executed, value returned
        - SQL string                      → ``spark.sql`` DataFrame returned
        - BOSS-style s-expression tuple (``("Select", ("Table", ...), ...)``
          — the expression language the reference's host speaks; see
          ``boss_expr``) → compiled to a DataFrame; a tuple whose head the
          dialect lacks passes through unchanged, exactly the reference's
          behavior for unhandled expressions (C2)
        - DataFrame                       → returned unchanged (identity —
          the reference's entire behavior, ``.cpp:32``)
        - anything else                   → returned unchanged (C2)
        """
        from bossarrowstorageengine_spark.boss_expr import (
            UnknownHead,
            compile_expr,
        )

        with self._lock:
            try:
                self._ensure_init()
                if callable(payload):
                    return EngineResult(value=payload(self._spark))
                if isinstance(payload, str):
                    return EngineResult(value=self._spark.sql(payload))
                if isinstance(payload, tuple):
                    try:
                        return EngineResult(value=compile_expr(
                            self._spark, payload, self._sf_dir))
                    except UnknownHead:
                        return EngineResult(value=payload)  # C2
                return EngineResult(value=payload)  # C2 pass-through
            except Exception as exc:  # noqa: BLE001 — totality is the contract
                return EngineResult(error=EngineError(
                    payload=payload, message=str(exc),
                    exception_type=type(exc).__name__))

    # -- tables ------------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        self._ensure_init()
        return catalog.load_table(self._spark, self._sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        self._ensure_init()
        return self._spark.sql(query)

    def explain(self, payload: Any, mode: str = "formatted") -> str:
        """Physical-plan text for any evaluatable payload (SQL string, BOSS
        s-expression tuple, DataFrame, or callable) — the plan-audit hook
        behind PLANS.md, exposed on the engine facade.  Raises (does not
        reify) on un-plannable payloads: explain is a diagnostic, not part
        of the total-evaluation contract."""
        res = self.evaluate(payload)
        if res.error is not None:
            raise RuntimeError(res.error.message)
        if not isinstance(res.value, DataFrame):
            raise TypeError(
                f"payload evaluated to {type(res.value).__name__}, "
                "not a DataFrame")
        return res.value._jdf.queryExecution().explainString(
            self._spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString(mode))

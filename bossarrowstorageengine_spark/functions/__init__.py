"""Reusable column-expression helpers (JVM-side Catalyst expressions only —
no Python UDFs; the UDF showcase lives in ``operators.udfs``)."""

"""Pipeline/plan layer: declarative configs → stage objects → execution,
plus the named-query registry consumed by ``__spark_entry__.py``."""

"""TypingTransform — schema-driven typing of raw (all-string) columns.

Reference semantics (host Arc stage + schema format, SURVEY.md §2b and
src/test/resources/userdata.json): per column — optional trim, values in
``nullableValues`` become NULL, datetime parsing tries each of ``formatters``
in order, ``timezoneId`` localizes zoneless timestamps, decimals take
precision/scale, and the free-form ``metadata`` object is attached to the
output ``StructField`` (the masking control plane).

Scale design: parsing stays JVM-side (``try_to_timestamp`` + ``coalesce``)
whenever the Java pattern translates to a Spark-parseable one; only exotic
patterns (day-of-week etc.) drop to an Arrow-batched pandas UDF — see
``functions.datetime_patterns``.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import TimestampType

from ..functions.datetime_patterns import java_to_spark_pattern, java_to_strptime
from ..schema import FieldSpec, parse_schema
from .base import PipelineContext, PipelineStage


def _python_timestamp_parser(formatters: list[str], timezone_id: str | None):
    """Tier-2 parser: strptime over translated formats, Arrow-batched."""
    strp_formats = [java_to_strptime(f) for f in formatters]
    tz_id = timezone_id

    @pandas_udf(TimestampType())
    def parse(values: pd.Series) -> pd.Series:
        from zoneinfo import ZoneInfo

        tz = None
        if tz_id and tz_id.upper() != "UTC":
            tz = ZoneInfo(tz_id)

        def one(v):
            if v is None:
                return None
            for fmt in strp_formats:
                try:
                    d = datetime.strptime(v, fmt)
                except ValueError:
                    continue
                if d.tzinfo is not None:
                    return d.astimezone(timezone.utc).replace(tzinfo=None)
                if tz is not None:
                    return d.replace(tzinfo=tz).astimezone(timezone.utc).replace(tzinfo=None)
                return d
            return None

        return pd.Series([one(v) for v in values], dtype="object")

    return parse


def typed_column(field: FieldSpec) -> Column:
    """Build the typed expression for one field (input column is string)."""
    col = F.col(field.name)
    if field.trim:
        col = F.trim(col)
    if field.nullable_values:
        col = F.when(col.isin(field.nullable_values), F.lit(None)).otherwise(col)

    t = field.type
    if t == "string":
        out = col
    elif t == "time":
        # No native TimeType in Spark: Arc types "time" as a format-VALIDATED
        # string (reference schema: TestUtils.scala:294-305, formatter
        # HH:mm:ss). Parse against the formatters (invalid → NULL, matching
        # the cast-failure semantics of the other types) and emit the
        # canonical HH:mm:ss rendering.
        formatters = field.formatters or ["HH:mm:ss"]
        patterns = [java_to_spark_pattern(f) or f for f in formatters]
        attempts = [F.try_to_timestamp(col, F.lit(p)) for p in patterns]
        parsed = F.coalesce(*attempts) if len(attempts) > 1 else attempts[0]
        out = F.date_format(parsed, "HH:mm:ss")
    elif t == "integer":
        out = col.cast("int")
    elif t == "long":
        out = col.cast("long")
    elif t == "double":
        out = col.cast("double")
    elif t == "boolean":
        out = col.cast("boolean")
    elif t == "decimal":
        out = col.cast(f"decimal({field.precision or 38},{field.scale or 18})")
    elif t in ("date", "timestamp"):
        formatters = field.formatters or (
            ["uuuu-MM-dd"] if t == "date" else ["uuuu-MM-dd HH:mm:ss"]
        )
        spark_patterns = [java_to_spark_pattern(f) for f in formatters]
        if all(p is not None for p in spark_patterns):
            attempts = [F.try_to_timestamp(col, F.lit(p)) for p in spark_patterns]
            out = F.coalesce(*attempts) if len(attempts) > 1 else attempts[0]
            if field.timezone_id and field.timezone_id.upper() != "UTC":
                out = F.to_utc_timestamp(out, field.timezone_id)
        else:
            out = _python_timestamp_parser(formatters, field.timezone_id)(col)
        if t == "date":
            out = out.cast("date")
    else:
        raise ValueError(f"unsupported type '{t}' for field '{field.name}'")
    return out.alias(field.name, metadata=field.metadata)


class TypingTransform(PipelineStage):
    stage_type = "TypingTransform"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_view: str,
        schema,  # FieldSpec list | Arc-JSON string | path
        persist: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_view = output_view
        self.fields = (
            schema if schema and isinstance(schema[0], FieldSpec) else parse_schema(schema)
        )
        self.persist = persist

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        typed = df.select([typed_column(f) for f in self.fields])
        ctx.register_view(typed, self.output_view)
        self.stage_detail.update(inputView=self.input_view, outputView=self.output_view)
        self._instrument(ctx, typed, self.persist)
        return typed

"""SQLTransform — run arbitrary SQL against registered views.

This is the reference's general query path (host Arc stage, exercised at
MaskDataPluginSuite.scala:52-66): any Spark SQL, with the mask UDFs available
as scalar functions, result registered as a view. ``sql_params`` substitution
reproduces Arc's ``${param}`` templating.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .base import PipelineContext, PipelineStage


def inject_parameters(sql: str, params: dict[str, str], allow_missing: bool = False) -> str:
    """Replace ``${name}`` placeholders (Arc SQLUtils.injectParameters
    equivalent, used for both SQL params and mask treatments)."""

    def repl(m: re.Match) -> str:
        key = m.group(1)
        if key in params:
            return str(params[key])
        if allow_missing:
            return m.group(0)
        raise KeyError(f"SQL parameter '{key}' not provided")

    return re.sub(r"\$\{\s*([A-Za-z0-9_]+)\s*\}", repl, sql)


class SQLTransform(PipelineStage):
    stage_type = "SQLTransform"

    def __init__(
        self,
        name: str,
        output_view: str,
        sql: str | None = None,
        input_uri: str | None = None,
        sql_params: dict[str, str] | None = None,
        persist: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        if (sql is None) == (input_uri is None):
            raise ValueError("SQLTransform requires exactly one of sql / input_uri")
        self.sql = sql
        self.input_uri = input_uri
        self.sql_params = sql_params or {}
        self.output_view = output_view
        self.persist = persist

    def run(self, ctx: PipelineContext) -> DataFrame:
        stmt = self.sql
        if stmt is None:
            with open(self.input_uri) as f:
                stmt = f.read()
        stmt = inject_parameters(stmt, self.sql_params)
        self.stage_detail["sql"] = stmt
        df = ctx.spark.sql(stmt)
        ctx.register_view(df, self.output_view)
        self._instrument(ctx, df, self.persist)
        return df

"""MaskDataTransform — metadata-driven masking projection.

The reference's core stage (src/main/scala/ai/tripl/arc/transform/
MaskDataTransform.scala:103-175): for every field whose ``StructField``
metadata carries ``mask.treatments``, fold the treatment templates into one
nested SQL expression (first template gets the column name at ``${value}``,
each later template wraps the previous expression), cast decimal/date results
back to the declared type, pass other fields through, run the single
generated ``SELECT``, re-attach the input schema's metadata, and register the
output view.

Scale design: the stage emits exactly one Catalyst ``Project`` — no shuffle —
and masking is kept as the LAST projection so predicate pushdown happens
below the UDF boundary (SURVEY.md §4: Catalyst cannot push predicates through
opaque mask UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Tp

from .base import PipelineContext, PipelineStage
from .sql import inject_parameters

MASK_KEY = "mask"
TREATMENTS_KEY = "treatments"


def compile_mask_expressions(schema: Tp.StructType, input_view: str) -> str:
    """Build the masking SELECT statement (MaskDataTransform.scala:112-139)."""
    exprs = []
    for field in schema.fields:
        md = field.metadata or {}
        if MASK_KEY in md:
            mask = md[MASK_KEY]
            if not isinstance(mask, dict):
                raise ValueError(f"field '{field.name}' has invalid type for '{MASK_KEY}'.")
            if TREATMENTS_KEY not in mask or not isinstance(mask[TREATMENTS_KEY], (list, tuple)):
                raise ValueError(
                    f"field '{field.name}' is missing treatments key '{TREATMENTS_KEY}'"
                )
            state = ""
            for treatment in mask[TREATMENTS_KEY]:
                target = field.name if state == "" else state
                state = inject_parameters(treatment, {"value": target})
            if isinstance(field.dataType, Tp.DecimalType):
                exprs.append(
                    f"CAST({state} AS DECIMAL({field.dataType.precision}, "
                    f"{field.dataType.scale})) AS {field.name}"
                )
            elif isinstance(field.dataType, Tp.DateType):
                exprs.append(f"CAST({state} AS DATE) AS {field.name}")
            else:
                exprs.append(f"{state} AS {field.name}")
        else:
            exprs.append(field.name)
    return "SELECT " + ", ".join(exprs) + f" FROM {input_view}"


def set_metadata(df: DataFrame, source_schema: Tp.StructType) -> DataFrame:
    """Re-attach the input schema's field metadata onto same-named output
    columns (``spark.sql`` drops metadata on computed expressions —
    MaskDataTransform.scala:153-154)."""
    by_name = {f.name: f.metadata for f in source_schema.fields}
    cols = [
        F.col(c).alias(c, metadata=by_name[c]) if by_name.get(c) else F.col(c)
        for c in df.columns
    ]
    return df.select(cols)


class MaskDataTransform(PipelineStage):
    stage_type = "MaskDataTransform"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_view: str,
        persist: bool = False,
        params: dict | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_view = output_view
        self.persist = persist
        self.params = params or {}

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        stmt = compile_mask_expressions(df.schema, self.input_view)
        self.stage_detail["sql"] = stmt
        transformed = ctx.spark.sql(stmt)
        out = set_metadata(transformed, df.schema)
        ctx.register_view(out, self.output_view)
        self.stage_detail.update(inputView=self.input_view, outputView=self.output_view)
        self._instrument(ctx, out, self.persist)
        return out

"""Source stages.

The reference's tests depend on the host framework's ``DelimitedExtract``
(CSV with header → all-string columns, reference:
MaskDataTransformSuite.scala:67-77); Parquet/JSON are the other formats the
host Arc framework provides. All are thin wrappers over ``spark.read`` so
Catalyst/DSv2 handle pushdown, pruning, and split planning — at 100 TB the
scan IS the query plan's foundation, so nothing custom sits between the
format and Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .base import PipelineContext, PipelineStage


class DelimitedExtract(PipelineStage):
    stage_type = "DelimitedExtract"

    def __init__(
        self,
        name: str,
        input_uri: str,
        output_view: str,
        header: bool = True,
        delimiter: str = ",",
        quote: str = '"',
        infer_schema: bool = False,
        multi_line: bool = False,
        num_partitions: int | None = None,
        streaming: bool = False,
        schema=None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view
        self.header = header
        self.delimiter = delimiter
        self.quote = quote
        self.infer_schema = infer_schema
        self.multi_line = multi_line
        self.num_partitions = num_partitions
        self.streaming = streaming
        self.schema = schema

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = ctx.spark.readStream if self.streaming else ctx.spark.read
        reader = (
            reader.format("csv")
            .option("header", self.header)
            .option("sep", self.delimiter)
            .option("quote", self.quote)
            .option("multiLine", self.multi_line)
        )
        if self.schema is not None:
            reader = reader.schema(self.schema)
        elif self.infer_schema and not self.streaming:
            reader = reader.option("inferSchema", True)
        df = reader.load(self.input_uri)
        if self.num_partitions:
            df = df.repartition(self.num_partitions)
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df


class ParquetExtract(PipelineStage):
    stage_type = "ParquetExtract"

    def __init__(
        self,
        name: str,
        input_uri: str,
        output_view: str,
        num_partitions: int | None = None,
        streaming: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view
        self.num_partitions = num_partitions
        self.streaming = streaming

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = ctx.spark.readStream if self.streaming else ctx.spark.read
        df = reader.parquet(self.input_uri)
        if self.num_partitions:
            df = df.repartition(self.num_partitions)
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df


class JSONExtract(PipelineStage):
    stage_type = "JSONExtract"

    def __init__(
        self,
        name: str,
        input_uri: str,
        output_view: str,
        multi_line: bool = False,
        schema=None,
        streaming: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view
        self.multi_line = multi_line
        self.schema = schema
        self.streaming = streaming

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = ctx.spark.readStream if self.streaming else ctx.spark.read
        reader = reader.format("json").option("multiLine", self.multi_line)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.load(self.input_uri)
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df

"""Sink stages. Thin wrappers over ``df.write`` / ``df.writeStream``.

At scale: ``partition_by`` maps to hive-style directory partitioning (the
unit of partition pruning for downstream readers); ``num_partitions``
controls output file count (repartition before write — at 100 TB, small-file
storms are as fatal as skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .base import PipelineContext, PipelineStage


class ParquetLoad(PipelineStage):
    stage_type = "ParquetLoad"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_uri: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        num_partitions: int | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_uri = output_uri
        self.mode = mode
        self.partition_by = partition_by or []
        self.num_partitions = num_partitions

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        out = df.repartition(self.num_partitions) if self.num_partitions else df
        writer = out.write.mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.output_uri)
        self.stage_detail.update(inputView=self.input_view, outputURI=self.output_uri)
        return df


class DelimitedLoad(PipelineStage):
    stage_type = "DelimitedLoad"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_uri: str,
        header: bool = True,
        delimiter: str = ",",
        mode: str = "overwrite",
        num_partitions: int | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_uri = output_uri
        self.header = header
        self.delimiter = delimiter
        self.mode = mode
        self.num_partitions = num_partitions

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        out = df.repartition(self.num_partitions) if self.num_partitions else df
        (
            out.write.mode(self.mode)
            .option("header", self.header)
            .option("sep", self.delimiter)
            .csv(self.output_uri)
        )
        self.stage_detail.update(inputView=self.input_view, outputURI=self.output_uri)
        return df


class JSONLoad(PipelineStage):
    stage_type = "JSONLoad"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_uri: str,
        mode: str = "overwrite",
        num_partitions: int | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_uri = output_uri
        self.mode = mode
        self.num_partitions = num_partitions

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        out = df.repartition(self.num_partitions) if self.num_partitions else df
        out.write.mode(self.mode).json(self.output_uri)
        self.stage_detail.update(inputView=self.input_view, outputURI=self.output_uri)
        return df


class ORCLoad(PipelineStage):
    stage_type = "ORCLoad"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_uri: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        num_partitions: int | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_uri = output_uri
        self.mode = mode
        self.partition_by = partition_by or []
        self.num_partitions = num_partitions

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        out = df.repartition(self.num_partitions) if self.num_partitions else df
        writer = out.write.mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.orc(self.output_uri)
        self.stage_detail.update(inputView=self.input_view, outputURI=self.output_uri)
        return df


class XMLLoad(PipelineStage):
    """XML sink — built into Spark since 4.0 (``rowTag`` element per row)."""

    stage_type = "XMLLoad"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_uri: str,
        row_tag: str = "row",
        root_tag: str = "rows",
        mode: str = "overwrite",
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_uri = output_uri
        self.row_tag = row_tag
        self.root_tag = root_tag
        self.mode = mode

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        (
            df.write.mode(self.mode)
            .format("xml")
            .option("rowTag", self.row_tag)
            .option("rootTag", self.root_tag)
            .save(self.output_uri)
        )
        self.stage_detail.update(inputView=self.input_view, outputURI=self.output_uri)
        return df


class TextLoad(PipelineStage):
    """Single-string-column text sink (one line per row)."""

    stage_type = "TextLoad"

    def __init__(
        self,
        name: str,
        input_view: str,
        output_uri: str,
        mode: str = "overwrite",
        num_partitions: int | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_view = input_view
        self.output_uri = output_uri
        self.mode = mode
        self.num_partitions = num_partitions

    def run(self, ctx: PipelineContext) -> DataFrame:
        df = ctx.spark.table(self.input_view)
        out = df.repartition(self.num_partitions) if self.num_partitions else df
        out.write.mode(self.mode).text(self.output_uri)
        self.stage_detail.update(inputView=self.input_view, outputURI=self.output_uri)
        return df


class CompactParquet(PipelineStage):
    """Small-files compaction: rewrite a parquet dataset into ~target-sized
    files.

    At 100 TB, streaming sinks and over-parallel writers leave millions of
    KB-sized files; every downstream scan then pays per-file open/footer cost
    and the driver pays listing memory. Compaction = read → repartition to
    ceil(bytes / target) → rewrite. Partitioned layouts are preserved by
    repartitioning on the partition columns so each output directory gets
    coherent files.
    """

    stage_type = "CompactParquet"

    def __init__(
        self,
        name: str,
        input_uri: str,
        output_uri: str,
        target_file_mb: int = 512,
        partition_by: list[str] | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_uri = output_uri
        self.target_file_mb = target_file_mb
        self.partition_by = partition_by or []

    def run(self, ctx: PipelineContext) -> DataFrame:
        import math

        spark = ctx.spark
        df = spark.read.parquet(self.input_uri)
        # size the output from the source bytes (parquet-compressed), not row
        # counts — compression ratio varies too much across schemas; Catalyst
        # already computed the relation size for this scan
        total_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        n_files = max(math.ceil(total_bytes / (self.target_file_mb * 1024 * 1024)), 1)
        out = (
            df.repartition(n_files, *self.partition_by)
            if self.partition_by
            else df.repartition(n_files)
        )
        writer = out.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.output_uri)
        self.stage_detail.update(
            inputURI=self.input_uri,
            outputURI=self.output_uri,
            estimatedBytes=total_bytes,
            targetFiles=n_files,
        )
        return df

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
        merge_schema: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view
        self.num_partitions = num_partitions
        self.streaming = streaming
        # schema drift is a fact of life for a years-old 100 TB dataset;
        # mergeSchema unions footers across files (costlier listing, so opt-in)
        self.merge_schema = merge_schema

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = ctx.spark.readStream if self.streaming else ctx.spark.read
        if self.merge_schema:
            reader = reader.option("mergeSchema", True)
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


class ORCExtract(PipelineStage):
    stage_type = "ORCExtract"

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
        df = reader.orc(self.input_uri)
        if self.num_partitions:
            df = df.repartition(self.num_partitions)
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df


class TextExtract(PipelineStage):
    """Line-per-row (or whole-file-per-row) text source.

    ``whole_text=True`` gives one row per file — the right granularity for
    document-corpus ingestion where a file IS a document; line mode splits at
    newlines and is splittable, so a 100 TB corpus parallelizes by block.
    """

    stage_type = "TextExtract"

    def __init__(
        self,
        name: str,
        input_uri: str,
        output_view: str,
        whole_text: bool = False,
        line_sep: str | None = None,
        streaming: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view
        self.whole_text = whole_text
        self.line_sep = line_sep
        self.streaming = streaming

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = ctx.spark.readStream if self.streaming else ctx.spark.read
        reader = reader.format("text").option("wholetext", self.whole_text)
        if self.line_sep is not None:
            reader = reader.option("lineSep", self.line_sep)
        df = reader.load(self.input_uri)
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df


class BinaryFileExtract(PipelineStage):
    """Opaque-binary source for multimodal ingestion (images/audio/video).

    Spark's built-in ``binaryFile`` format yields
    ``(path, modificationTime, length, content: binary)`` — the schema the
    multimodal operators (operators/multimodal.py) expect as input. At scale
    the directory listing is distributed, each file is one row, and
    ``pathGlobFilter`` prunes by extension server-side; pair with
    ``spark.sql.files.maxPartitionBytes`` so a few giant media files don't
    serialize into one task.
    """

    stage_type = "BinaryFileExtract"

    def __init__(
        self,
        name: str,
        input_uri: str,
        output_view: str,
        path_glob_filter: str | None = None,
        recursive: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view
        self.path_glob_filter = path_glob_filter
        self.recursive = recursive

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = ctx.spark.read.format("binaryFile")
        if self.path_glob_filter:
            reader = reader.option("pathGlobFilter", self.path_glob_filter)
        if self.recursive:
            reader = reader.option("recursiveFileLookup", True)
        df = reader.load(self.input_uri)
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df


class AvroExtract(PipelineStage):
    """Avro source. Spark ships the `avro` format in the external
    spark-avro module; when the jar is absent, fail with a clear message
    instead of Spark's ClassNotFound chain."""

    stage_type = "AvroExtract"

    def __init__(self, name: str, input_uri: str, output_view: str, **kw):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view

    def run(self, ctx: PipelineContext) -> DataFrame:
        try:
            df = ctx.spark.read.format("avro").load(self.input_uri)
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                "AvroExtract requires the spark-avro module on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
            ) from exc
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df


class XMLExtract(PipelineStage):
    """XML source — built into Spark since 4.0 (no external spark-xml jar).

    ``row_tag`` selects the repeating element that becomes one row; schema
    inference walks the documents unless an explicit schema is given (always
    give one at scale — inference is an extra full pass over 100 TB)."""

    stage_type = "XMLExtract"

    def __init__(
        self,
        name: str,
        input_uri: str,
        output_view: str,
        row_tag: str = "row",
        schema=None,
        streaming: bool = False,
        **kw,
    ):
        super().__init__(name, **kw)
        self.input_uri = input_uri
        self.output_view = output_view
        self.row_tag = row_tag
        self.schema = schema
        self.streaming = streaming

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = ctx.spark.readStream if self.streaming else ctx.spark.read
        reader = reader.format("xml").option("rowTag", self.row_tag)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.load(self.input_uri)
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(inputURI=self.input_uri, outputView=self.output_view)
        return df


class JDBCExtract(PipelineStage):
    """JDBC source. ``partition_column``/``num_partitions``/bounds map to
    Spark's parallel JDBC reads — without them the whole table funnels
    through ONE connection, which at 100 TB is not a plan."""

    stage_type = "JDBCExtract"

    def __init__(
        self,
        name: str,
        jdbc_url: str,
        table: str,
        output_view: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
        fetch_size: int = 10000,
        properties: dict | None = None,
        **kw,
    ):
        super().__init__(name, **kw)
        self.jdbc_url = jdbc_url
        self.table = table
        self.output_view = output_view
        self.partition_column = partition_column
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        self.num_partitions = num_partitions
        self.fetch_size = fetch_size
        self.properties = properties or {}

    def run(self, ctx: PipelineContext) -> DataFrame:
        reader = (
            ctx.spark.read.format("jdbc")
            .option("url", self.jdbc_url)
            .option("dbtable", self.table)
            .option("fetchsize", self.fetch_size)
        )
        if self.partition_column is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", self.lower_bound)
                .option("upperBound", self.upper_bound)
                .option("numPartitions", self.num_partitions or 8)
            )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        df = reader.load()
        ctx.register_view(df, self.output_view)
        self.stage_detail.update(table=self.table, outputView=self.output_view)
        return df

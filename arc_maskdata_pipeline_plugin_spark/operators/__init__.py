"""Pipeline stages (the engine's operator surface) and large-scale data ops.

Stage model mirrors the reference's Arc plugin contract (SURVEY.md §3): each
stage validates its config, reads a registered temp view, produces a
DataFrame, and registers it as the output view — stages communicate ONLY
through the Spark catalog's temp-view namespace.
"""

from .base import PipelineContext, PipelineStage, StageError  # noqa: F401
from .extract import (  # noqa: F401
    AvroExtract,
    BinaryFileExtract,
    DelimitedExtract,
    JDBCExtract,
    JSONExtract,
    ORCExtract,
    ParquetExtract,
    TextExtract,
    XMLExtract,
)
from .load import (  # noqa: F401
    CompactParquet,
    DelimitedLoad,
    JSONLoad,
    ORCLoad,
    ParquetLoad,
    TextLoad,
    XMLLoad,
)
from .mask import MaskDataTransform  # noqa: F401
from .sql import SQLTransform  # noqa: F401
from .typing import TypingTransform  # noqa: F401

"""Multimodal-plumbing query: binary payload → Arrow-batched feature
extraction (``mapInPandas``). The decode step is the deterministic fake
(operators/multimodal.py), whose formula the DuckDB oracle reproduces from
byte lengths — proving the Spark-side plumbing (schema, batching, binary
transport) end-to-end.
"""

from __future__ import annotations

from ..operators.multimodal import attach_binary_payload, extract_image_features
from .registry import T, register


@register(
    "q_multimodal_features",
    oracle="""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_bytes,
       CAST(n % 640 + 1 AS INTEGER) AS width,
       CAST((n * 7) % 480 + 1 AS INTEGER) AS height,
       list_extract(['RGB', 'RGBA', 'L', 'CMYK'], n % 4 + 1) AS mode
FROM p
""",
)
def q_multimodal_features(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return extract_image_features(attach_binary_payload(d))

"""Arc-style JSON schema loader.

The reference declares schemas in JSON files consumed by the host framework's
``TypingTransform`` (reference: src/test/resources/userdata.json — per-column
``name``, ``type``, ``trim``, ``nullable``, ``nullableValues``, ``formatters``,
``timezoneId``, ``precision``/``scale``, free-form ``metadata``). The
``metadata`` object is the masking control plane: it lands in
``StructField.metadata`` and drives ``MaskDataTransform``
(reference: MaskDataTransform.scala:104-117).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as Tp


@dataclass
class FieldSpec:
    name: str
    type: str  # string|integer|long|double|boolean|decimal|date|timestamp|time
    trim: bool = False
    nullable: bool = True
    nullable_values: list[str] = dc_field(default_factory=list)
    formatters: list[str] = dc_field(default_factory=list)
    timezone_id: str | None = None
    precision: int | None = None
    scale: int | None = None
    metadata: dict = dc_field(default_factory=dict)

    def spark_type(self) -> Tp.DataType:
        t = self.type
        if t == "string" or t == "time":  # no native time type → formatted string
            return Tp.StringType()
        if t == "integer":
            return Tp.IntegerType()
        if t == "long":
            return Tp.LongType()
        if t == "double":
            return Tp.DoubleType()
        if t == "boolean":
            return Tp.BooleanType()
        if t == "decimal":
            return Tp.DecimalType(self.precision or 38, self.scale or 18)
        if t == "date":
            return Tp.DateType()
        if t == "timestamp":
            return Tp.TimestampType()
        raise ValueError(f"unsupported schema type '{t}' for field '{self.name}'")

    def struct_field(self) -> Tp.StructField:
        return Tp.StructField(self.name, self.spark_type(), self.nullable, metadata=self.metadata)


def parse_schema(spec: str | list[dict]) -> list[FieldSpec]:
    """Parse an Arc-style schema: a JSON string, a path to one, or the
    already-parsed list of field objects."""
    if isinstance(spec, str):
        if spec.lstrip().startswith("["):
            spec = json.loads(spec)
        else:
            with open(spec) as f:
                spec = json.load(f)
    out = []
    for f in spec:
        out.append(
            FieldSpec(
                name=f["name"],
                type=f["type"],
                trim=bool(f.get("trim", False)),
                nullable=bool(f.get("nullable", True)),
                nullable_values=list(f.get("nullableValues", [])),
                formatters=list(f.get("formatters", [])),
                timezone_id=f.get("timezoneId"),
                precision=f.get("precision"),
                scale=f.get("scale"),
                metadata=dict(f.get("metadata", {})),
            )
        )
    return out


def to_struct_type(fields: list[FieldSpec]) -> Tp.StructType:
    return Tp.StructType([f.struct_field() for f in fields])

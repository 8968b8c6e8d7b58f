"""Version-dispatched typed payload extraction (schema-on-read upcast).

The engine extension SURVEY.md §1.3 sketches: per-(event, event_version)
payload StructTypes are registered in the ``payload_schemas`` state table;
``EventStore.events_typed`` applies the matching ``from_json`` per version
and upcasts every older version to the LATEST version's shape — fields the
old version lacks become typed NULLs, fields it dropped are omitted, and
same-named fields are cast to the latest type.  The reference keeps
payloads opaque JSONB and leaves typing to consumers (``data JSONB`` —
/root/reference/schema.sql:37); this makes the read-side contract explicit
while the log stays schemaless.

Everything is built from ``from_json`` + ``struct`` + a ``CASE`` chain —
JVM-native, codegen-friendly, zero Python row work, so the typed view costs
the same as any expression projection at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def as_struct_type(schema) -> StructType:
    """Accept a StructType or a Spark DDL string ('k BIGINT, q STRING')."""
    if isinstance(schema, StructType):
        return schema
    return StructType.fromDDL(schema)


def upcast_struct(parsed: Column, from_schema: StructType, to_schema: StructType) -> Column:
    """Project a parsed payload struct onto ``to_schema``: shared fields
    cast to the target type, missing fields as typed NULLs."""
    have = {f.name for f in from_schema.fields}
    fields = []
    for f in to_schema.fields:
        if f.name in have:
            fields.append(parsed[f.name].cast(f.dataType).alias(f.name))
        else:
            fields.append(F.lit(None).cast(f.dataType).alias(f.name))
    return F.struct(*fields)


def typed_payload_column(
    data_col: Column, version_col: Column, schemas: dict[int, "StructType | str"]
) -> Column:
    """The ``payload`` column of the typed view: dispatch on
    ``version_col``, parse ``data_col`` with that version's schema, upcast
    to the latest version's shape.  Unmatched versions yield NULL (callers
    that must fail loudly instead pre-validate — see
    ``EventStore.events_typed``)."""
    if not schemas:
        raise ValueError("typed_payload_column needs at least one schema")
    parsed_schemas = {int(v): as_struct_type(s) for v, s in schemas.items()}
    latest = parsed_schemas[max(parsed_schemas)]
    expr = None
    for v in sorted(parsed_schemas):
        sv = parsed_schemas[v]
        branch = upcast_struct(F.from_json(data_col, sv), sv, latest)
        cond = version_col == F.lit(v)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(F.lit(None).cast(latest))

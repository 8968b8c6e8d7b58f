"""Version-dispatched typed payload extraction (schema-on-read upcast).

The engine extension SURVEY.md §1.3 sketches: per-(event, event_version)
payload StructTypes are registered in the ``payload_schemas`` state table;
``EventStore.events_typed`` applies the matching ``from_json`` per version
and upcasts every older version to the LATEST version's shape — fields the
old version lacks become typed NULLs, fields it dropped are omitted,
same-named fields are cast to the latest type, and (r6) RENAMED fields are
routed to their old name per version while numeric types may WIDEN
(int → bigint, float → double, …).  The reference keeps payloads opaque
JSONB and leaves typing to consumers (``data JSONB`` —
/root/reference/schema.sql:37); this makes the read-side contract explicit
while the log stays schemaless.

Everything is built from ``from_json`` + ``struct`` + a ``CASE`` chain —
JVM-native, codegen-friendly, zero Python row work, so the typed view costs
the same as any expression projection at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType


def as_struct_type(schema) -> StructType:
    """Accept a StructType or a Spark DDL string ('k BIGINT, q STRING')."""
    if isinstance(schema, StructType):
        return schema
    return StructType.fromDDL(schema)


# Numeric widening lattice (register-time evolution validation): a field may
# evolve its type only along these edges (or stay identical) — anything else
# is a silent-data-loss rewrite and is rejected loudly at registration.
_INT_RANK = {"tinyint": 1, "smallint": 2, "int": 3, "bigint": 4}
_FLOAT_RANK = {"float": 1, "double": 2}


def is_widening(old: DataType, new: DataType) -> bool:
    """True when ``old`` → ``new`` is the identity or a safe numeric
    widening: integral → wider integral, float → double, or integral →
    floating (documented: a bigint near 2^63 loses precision in double —
    the standard SQL promotion trade, same as Postgres int8 → float8)."""
    if old == new:
        return True
    o, n = old.simpleString(), new.simpleString()
    if o in _INT_RANK and n in _INT_RANK:
        return _INT_RANK[o] <= _INT_RANK[n]
    if o in _FLOAT_RANK and n in _FLOAT_RANK:
        return _FLOAT_RANK[o] <= _FLOAT_RANK[n]
    if o in _INT_RANK and n in _FLOAT_RANK:
        return True
    return False


def source_field_name(
    target_name: str,
    from_version: int,
    versions: "list[int]",
    renames: "dict[int, dict[str, str]]",
) -> str:
    """Resolve what a LATEST-shape field was called in ``from_version``:
    walk the rename maps of every version NEWER than ``from_version``
    backwards (a version's ``renames`` maps its new name → the previous
    version's name).  E.g. v2 renames {"k_id": "k"}: for v1 rows, target
    field ``k_id`` sources from ``k``."""
    name = target_name
    for v in sorted(versions, reverse=True):
        if v <= from_version:
            break
        name = renames.get(v, {}).get(name, name)
    return name


def upcast_struct(
    parsed: Column,
    from_schema: StructType,
    to_schema: StructType,
    field_sources: "dict[str, str] | None" = None,
) -> Column:
    """Project a parsed payload struct onto ``to_schema``: shared (or
    rename-routed, via ``field_sources`` target-name → source-name) fields
    cast to the target type, missing fields as typed NULLs."""
    have = {f.name for f in from_schema.fields}
    sources = field_sources or {}
    fields = []
    for f in to_schema.fields:
        src = sources.get(f.name, f.name)
        if src in have:
            fields.append(parsed[src].cast(f.dataType).alias(f.name))
        else:
            fields.append(F.lit(None).cast(f.dataType).alias(f.name))
    return F.struct(*fields)


def typed_payload_column(
    data_col: Column,
    version_col: Column,
    schemas: dict[int, "StructType | str"],
    renames: "dict[int, dict[str, str]] | None" = None,
    target_schema: "StructType | str | None" = None,
    unmatched: str = "null",
) -> Column:
    """The ``payload`` column of the typed view: dispatch on
    ``version_col``, parse ``data_col`` with that version's schema, upcast
    to the latest version's shape (or an explicit ``target_schema`` — the
    multi-event union view passes the merged shape).

    ``renames`` maps version → {new_name: previous_name} so older rows'
    fields route to their historical names (see ``source_field_name``).

    ``unmatched`` controls rows whose version has no registered schema:
    ``"null"`` yields a NULL payload (the pure-function default — callers
    pre-validate); ``"error"`` raises at EVALUATION time via
    ``raise_error`` so versions appended AFTER a view was constructed
    fail loudly instead of masquerading as parse failures (ADVICE r5) —
    the CASE branch only evaluates for unmatched rows, so registered
    data never pays it."""
    if not schemas:
        raise ValueError("typed_payload_column needs at least one schema")
    if unmatched not in ("null", "error"):
        raise ValueError(f"unmatched must be 'null' or 'error': {unmatched!r}")
    parsed_schemas = {int(v): as_struct_type(s) for v, s in schemas.items()}
    versions = sorted(parsed_schemas)
    renames = {int(v): dict(m) for v, m in (renames or {}).items()}
    latest = (
        as_struct_type(target_schema)
        if target_schema is not None
        else parsed_schemas[versions[-1]]
    )
    expr = None
    for v in versions:
        sv = parsed_schemas[v]
        sources = {
            f.name: source_field_name(f.name, v, versions, renames)
            for f in latest.fields
        }
        branch = upcast_struct(F.from_json(data_col, sv), sv, latest, sources)
        cond = version_col == F.lit(v)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    if unmatched == "error":
        loud = F.raise_error(
            F.concat(
                F.lit("no payload schema registered for version "),
                F.coalesce(version_col.cast("string"), F.lit("NULL")),
                F.lit(
                    " (appended after the typed view was constructed? "
                    "the view snapshots the registry at construction — "
                    "rebuild it after registering the version)"
                ),
            )
        ).cast(latest)
        return expr.otherwise(loud)
    return expr.otherwise(F.lit(None).cast(latest))


def validate_evolution(
    prev: StructType,
    new: StructType,
    renamed_from: "dict[str, str] | None",
) -> "list[str]":
    """Register-time evolution check for a NEW latest version against the
    previous latest: every new-version field must be (a) brand new, (b)
    same name with identical or widened type, or (c) an explicit rename
    (``renamed_from[new_name] = old_name``) with identical or widened
    type.  Returns a list of violation strings (empty = valid); silent
    narrowing/retyping is the schema-registry analogue of the log's
    R1-R4 immutability rules."""
    renamed_from = renamed_from or {}
    prev_fields = {f.name: f.dataType for f in prev.fields}
    problems = []
    for new_name, old_name in renamed_from.items():
        if old_name not in prev_fields:
            problems.append(
                f"rename {new_name!r} <- {old_name!r}: {old_name!r} does "
                "not exist in the previous version"
            )
        if new_name == old_name:
            problems.append(f"rename {new_name!r} <- {old_name!r} is a no-op")
    new_names = {f.name for f in new.fields}
    for f in new.fields:
        src = renamed_from.get(f.name, f.name)
        if src not in prev_fields:
            continue  # brand-new field
        if not is_widening(prev_fields[src], f.dataType):
            problems.append(
                f"field {f.name!r}: {prev_fields[src].simpleString()} -> "
                f"{f.dataType.simpleString()} is not identity or a numeric "
                "widening"
            )
    for new_name, old_name in renamed_from.items():
        if new_name not in new_names:
            problems.append(
                f"rename target {new_name!r} is not a field of the new version"
            )
    return problems

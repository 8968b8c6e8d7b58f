"""Column-level scalar helpers (reference parity per SURVEY.md §2.2).

| Reference (file:line)                                   | Helper here          |
|---------------------------------------------------------|----------------------|
| ``gen_random_uuid()`` (tests/…/test_append_event.sql:17)| ``new_uuid``         |
| deterministic ids for bulk ingest (engine need)         | ``deterministic_uuid``|
| ``jsonb_build_object(…)`` (extensions.sql:46)           | ``json_object``      |
| ``->>'key'`` (tests/utils/assertions.sql:340)           | ``json_get``         |
| ``NOW() + (v_seconds||'s')::INTERVAL`` (schema.sql:413) | ``lease_until``      |
| ``EXTRACT(EPOCH FROM ts)`` (tests/utils/test-helpers.sql:55) | ``epoch_seconds`` |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def new_uuid() -> Column:
    """A random v4 UUID per row (``gen_random_uuid()`` analogue).
    Non-deterministic — Catalyst will not collapse duplicate calls."""
    return F.expr("uuid()")


def deterministic_uuid(*cols: Column | str) -> Column:
    """A stable UUID-shaped id derived from the md5 of the input columns —
    for bulk ingest where retried tasks must produce identical ids
    (``monotonically_increasing_id`` and ``uuid()`` are both unstable
    across task retries; a content hash is not).
    """
    m = F.md5(F.concat_ws("\x1f", *[F.col(c) if isinstance(c, str) else c for c in cols]))
    # Bind the digest ONCE through a higher-order-function lambda variable
    # (r14, guide §1.2 per-task work): inlined, the five substrings each
    # carried their own copy of the md5 subtree and codegen's subexpression
    # elimination did not reliably collapse them — the r14 plan showed
    # md5 spelled out 10x per ingest row (uuid + its window lag), and an
    # explicit single-digest projection A/B'd ~25% faster on the ingest
    # mapping.  transform's lambda evaluates `m` exactly once per row and
    # the slices reference the bound variable; the produced string is
    # byte-identical to the inline form.
    return F.transform(
        F.array(m),
        lambda h: F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        ),
    )[0]


def json_get(col: Column | str, key: str) -> Column:
    """``data ->> 'key'`` — JSON field extracted as a string, JVM-side
    (get_json_object; never a Python UDF in the hot path)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, f"$.{key}")


def json_object(**fields: Column) -> Column:
    """``jsonb_build_object(k1, v1, …)`` — a JSON string built from named
    columns (the push-delivery payload shape, extensions.sql:46)."""
    return F.to_json(F.struct(*[v.alias(k) for k, v in fields.items()]))


def lease_until(seconds: Column | int) -> Column:
    """``NOW() + (v_seconds || 's')::INTERVAL`` (schema.sql:413): lease
    expiry from the per-call frozen clock.  Accepts a literal or a column
    of seconds (``make_interval`` handles the column form)."""
    secs = F.lit(seconds) if isinstance(seconds, int) else seconds
    return F.current_timestamp() + F.make_interval(secs=secs)


def epoch_seconds(ts: Column | str) -> Column:
    """``EXTRACT(EPOCH FROM ts)`` as a long."""
    return F.unix_timestamp(F.col(ts) if isinstance(ts, str) else ts)

"""Hive DDL renderer — the codegen layer.

Re-expresses the reference's exemplar→string printer
(``out``/``definition``/``table``, ``/root/reference/Schemer.scala:67-115``)
over our descriptor lattice.  Runs entirely on the driver: the distributed
part of the engine ends with one small schema descriptor.

Faithfulness notes (each a documented decision, SURVEY §7):

- Tab indentation, ``ARRAY<…>``/``STRUCT<…>`` multi-line layout, ``???`` for
  unknown, ``NUMERIC(p, s)`` spelling and the int/float ladder thresholds all
  match ``Schemer.scala:67-97``.
- Struct fields are comma-separated.  The reference's *code* omits the commas
  (``Schemer.scala:92-95`` joins with only ``\\n``) while its README golden
  output has them (``README.md:29-31``); commas are the valid Hive syntax, so
  we follow the README.
- VARCHAR bound: reference uses ``0 < n < 65356`` — a typo for Hive's 65535
  (``Schemer.scala:73``).  We use ``0 < n <= 65535`` (deviation noted).
- Numeric tiers use min *and* max bounds (reference keeps only the max and
  mis-tiers mixed-sign columns — SURVEY §1.4 bug, fixed).
"""

from __future__ import annotations

from .lattice import (
    MapOf,
    Arr,
    Bool,
    Descriptor,
    Num,
    Str,
    Struct,
    Ts,
    Unknown,
    num_bounds_precision,
)

VARCHAR_MAX = 65535  # Hive's real bound; reference typo'd 65356 (Schemer.scala:73)

_TINY_MIN, _TINY_MAX = -128, 127
_SMALL_MIN, _SMALL_MAX = -32768, 32767
_INT_MIN, _INT_MAX = -2147483648, 2147483647
_LONG_MIN, _LONG_MAX = -9223372036854775808, 9223372036854775807


def _numeric_type(num: Num) -> str:
    """The VARCHAR/int-ladder/FLOAT/DOUBLE/NUMERIC decision tree
    (``Schemer.scala:77-85``), with min/max bounds instead of a max exemplar."""
    if num.max_scale == 0:
        lo, hi = int(num.lo), int(num.hi)
        if _TINY_MIN <= lo and hi <= _TINY_MAX:
            return "TINYINT"
        if _SMALL_MIN <= lo and hi <= _SMALL_MAX:
            return "SMALLINT"
        if _INT_MIN <= lo and hi <= _INT_MAX:
            return "INT"
        if _LONG_MIN <= lo and hi <= _LONG_MAX:
            return "BIGINT"
        return f"NUMERIC({num_bounds_precision(num)}, 0)"
    p = num_bounds_precision(num)
    if p <= 7:
        return "FLOAT"
    if p <= 15:
        return "DOUBLE"
    return f"NUMERIC({p}, {num.max_scale})"


def render_type(desc: Descriptor, indent: int = 0, key: str | None = None) -> str:
    """Render one descriptor as a Hive type string (``out``,
    ``Schemer.scala:67-97``): tab-indented, recursive, ``???`` for unknown."""
    pad = "\t" * indent
    prefix = pad + (key + " " if key else "")
    if isinstance(desc, Unknown):
        return prefix + "???"
    if isinstance(desc, Bool):
        return prefix + "BOOLEAN"
    if isinstance(desc, Ts):  # opt-in detect_dates deviation (lattice.Ts)
        return prefix + ("TIMESTAMP" if desc.has_time else "DATE")
    if isinstance(desc, Str):
        n = desc.max_len
        if 0 < n <= VARCHAR_MAX:
            return prefix + f"VARCHAR({n})"
        return prefix + "STRING"
    if isinstance(desc, Num):
        return prefix + _numeric_type(desc)
    if isinstance(desc, Arr):
        return "\n".join(
            [prefix + "ARRAY<", render_type(desc.element, indent + 1), pad + ">"]
        )
    if isinstance(desc, MapOf):  # opt-in structs_to_maps deviation
        return "\n".join(
            [
                prefix + "MAP<STRING,",
                render_type(desc.value, indent + 1),
                pad + ">",
            ]
        )
    if isinstance(desc, Struct):
        lines = [prefix + "STRUCT<"]
        fields = list(desc.fields.items())
        for i, (k, v) in enumerate(fields):
            comma = "," if i < len(fields) - 1 else ""
            lines.append(render_type(v, indent + 1, key=k + ":") + comma)
        lines.append(pad + ">")
        return "\n".join(lines)
    raise TypeError(f"unrenderable descriptor: {desc!r}")


def render_definition(schema: Descriptor, indent: int = 0) -> str:
    """Top-level column list, ``name TYPE`` joined by ``,\\n``
    (``definition``, ``Schemer.scala:99-105``; non-struct ⇒ ``ERROR``)."""
    if not isinstance(schema, Struct):
        return "ERROR"
    return ",\n".join(
        render_type(v, indent, key=k) for k, v in schema.fields.items()
    )


def render_table(schema: Descriptor, name: str, file: str) -> str:
    """Full three-statement Hive script (``table``, ``Schemer.scala:107-115``):
    ``ADD JAR`` + ``CREATE TABLE … ROW FORMAT SERDE`` + ``LOAD DATA``."""
    return "\n".join(
        [
            "ADD JAR hive-json-serde-0.2.jar;",
            "",
            f"CREATE TABLE {name} (",
            render_definition(schema, 1),
            ") ROW FORMAT SERDE 'org.apache.hadoop.hive.contrib.serde2.JsonSerde';",
            "",
            f"LOAD DATA LOCAL INPATH '{file}' INTO TABLE {name};",
        ]
    )

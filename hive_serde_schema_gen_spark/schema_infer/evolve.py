"""Schema evolution: diff two inferred schemas and emit ALTER TABLE hints
(SURVEY §7 M4 stretch).

Typical use: yesterday's inferred schema vs today's — which columns appeared,
which types must widen, and which changes are incompatible under the lattice
(kind changes that would have thrown RowMismatch).  Widening is decided by
the same merge lattice that drives inference: ``new ⊑ merge(old, new)`` with
``merge(old, new) == described type of new`` ⇒ widening; merge failure ⇒
incompatible.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from .errors import SchemaGenError
from .lattice import Descriptor, Struct, merge
from .render import render_type


@dataclass
class Change:
    kind: str  # added | removed | widened | narrowed | incompatible | unchanged
    column: str
    old: str
    new: str


def diff(old: Descriptor, new: Descriptor) -> List[Change]:
    if not isinstance(old, Struct) or not isinstance(new, Struct):
        raise TypeError("diff expects top-level struct schemas")
    changes: List[Change] = []
    for name, od in old.fields.items():
        nd = new.fields.get(name)
        if nd is None:
            changes.append(Change("removed", name, render_type(od), ""))
            continue
        ot, nt = render_type(od), render_type(nd)
        if ot == nt:
            changes.append(Change("unchanged", name, ot, nt))
            continue
        try:
            merged = merge(od, nd)
        except SchemaGenError:
            changes.append(Change("incompatible", name, ot, nt))
            continue
        mt = render_type(merged)
        if mt == ot:
            # new ⊑ old: today's data merely needs less than the existing
            # column provides — no ALTER required, and calling it "widened"
            # would emit a no-op CHANGE COLUMN
            changes.append(Change("narrowed", name, ot, nt))
        else:
            changes.append(Change("widened", name, ot, mt))
    for name, nd in new.fields.items():
        if name not in old.fields:
            changes.append(Change("added", name, "", render_type(nd)))
    return changes


def alter_statements(table: str, old: Descriptor, new: Descriptor) -> List[str]:
    """Hive ALTER TABLE script for an old→new evolution; incompatible and
    removed columns become comments (Hive cannot drop or re-kind in place)."""
    stmts: List[str] = []
    for ch in diff(old, new):
        flat_old = " ".join(ch.old.split())
        flat_new = " ".join(ch.new.split())
        if ch.kind == "added":
            stmts.append(f"ALTER TABLE {table} ADD COLUMNS ({ch.column} {flat_new});")
        elif ch.kind == "widened":
            stmts.append(
                f"ALTER TABLE {table} CHANGE COLUMN {ch.column} {ch.column} {flat_new};"
            )
        elif ch.kind == "removed":
            stmts.append(
                f"-- column {ch.column} ({flat_old}) no longer observed; "
                "Hive cannot drop columns in place"
            )
        elif ch.kind == "incompatible":
            stmts.append(
                f"-- INCOMPATIBLE: {ch.column} changed kind {flat_old} -> "
                f"{flat_new}; manual migration required"
            )
    return stmts

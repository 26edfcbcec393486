"""Pass P5 — symbol resolution.

Builds a **bidirectional** symbol table mapping the canonical JSON-pointer of
each sub-spec (``#/definitions/A``, ``#/properties/A``) to its declared
``$id`` and back, recursing into ``definitions`` and ``properties`` only —
mirroring the reference (/root/reference/src/main/scala/SymbolResolver.scala:7-46
and the rationale in SymbolResolverSpec.scala:12-25): a ``$ref`` may target a
sub-spec either by canonical pointer or by its declared ``$id``; both must
resolve to the same node.
"""

from __future__ import annotations

from typing import Dict

from .model import ConstraintSpec, JSchema, RootConstraintSpec

Symbols = Dict[str, str]


def resolve_symbols(root: RootConstraintSpec) -> Symbols:
    table: Symbols = {}
    _walk(root.spec, "#", table)
    return table


def _walk(s: JSchema, pointer: str, table: Symbols) -> None:
    if isinstance(s, bool):
        return
    if s.id is not None and pointer != "#":
        table[pointer] = s.id
        table[s.id] = pointer
    for name, sub in s.definitions.items():
        _walk(sub, f"{pointer}/definitions/{name}", table)
    for name, sub in s.properties.items():
        _walk(sub, f"{pointer}/properties/{name}", table)

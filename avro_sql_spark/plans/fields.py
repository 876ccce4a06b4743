"""Projection-list IR + dialect parser.

``Field`` mirrors the contract of ``com.landoop:sql-core``'s Field as
reconstructed from its call sites in the reference
(AvroSql.scala:134-159, AvroSchemaSql.scala:145-235) — see SURVEY.md §1.3:
one SELECT item with ``name`` (``"*"`` encodes a star), ``alias`` and the
dotted ``parents`` path prefix.

The parser replaces the reference's Calcite front door
(AvroSql.scala:44-65): MySQL-ish lexing (case-insensitive keywords,
backtick quoting), only SELECT accepted, the FROM clause parsed but
ignored, and a trailing ``withstructure`` keyword detected and stripped
before parsing exactly as AvroSql.scala:53-56 does.

Parsing happens ONCE per query on the driver; the result is a plan, never
consulted per row (unlike the reference, which re-derives the output
schema per record — AvroSql.scala:74-82).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from ..errors import AvroSqlError

_WITHSTRUCTURE = "withstructure"

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<ident>[A-Za-z_][A-Za-z0-9_$]*)
      | `(?P<quoted>[^`]+)`
      | (?P<star>\*)
      | (?P<dot>\.)
      | (?P<comma>,)
      | (?P<other>\S)
    )""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class Field:
    """One SELECT item. ``name == "*"`` encodes a star at path ``parents``."""

    name: str
    alias: str
    parents: tuple[str, ...] = dc_field(default=())

    @property
    def has_parents(self) -> bool:
        return len(self.parents) > 0

    @property
    def is_star(self) -> bool:
        return self.name == "*"

    @property
    def path(self) -> str:
        return ".".join((*self.parents, self.name))


class SqlContext:
    """Path-indexed lookup over the projection list.

    ``entries_for_path(parents)`` reconstructs sql-core's
    ``getFieldsForPath`` (call sites AvroSql.scala:192,252;
    AvroSchemaSql.scala:267): returns, in query order of first mention,
    ``("L", Field)`` for a terminal selection at this exact path and
    ``("R", child_name)`` for an intermediate segment that must be kept
    (with its original name, AvroSchemaSql.scala:305-311) to reach deeper
    selections.
    """

    def __init__(self, fields: list[Field]):
        self.fields = list(fields)

    def entries_for_path(self, parents: tuple[str, ...]):
        out: list[tuple[str, object]] = []
        seen_children: set[str] = set()
        n = len(parents)
        for f in self.fields:
            fp = f.parents
            if fp == parents:
                out.append(("L", f))
            elif len(fp) > n and fp[:n] == parents:
                child = fp[n]
                if child not in seen_children:
                    seen_children.add(child)
                    out.append(("R", child))
        return out

    def has_entries_under(self, parents: tuple[str, ...]) -> bool:
        n = len(parents)
        return any(f.parents[:n] == parents and len(f.parents) >= n for f in self.fields)


def split_withstructure(query: str) -> tuple[str, bool]:
    """Detect and strip a trailing ``withstructure`` keyword
    (case-insensitive suffix test after trim, as AvroSql.scala:53-56 —
    with one deliberate divergence: a WORD BOUNDARY is required before
    the keyword. The reference's bare endsWith would corrupt a query
    whose last identifier merely ends in 'withstructure', e.g.
    ``SELECT awithstructure`` silently became ``SELECT a`` in
    structure mode; here it stays a plain field selection)."""
    trimmed = query.strip()
    if trimmed.lower().endswith(_WITHSTRUCTURE):
        head = trimmed[: -len(_WITHSTRUCTURE)]
        if head and head[-1].isspace():
            return head.rstrip(), True
    return trimmed, False


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            break
        pos = m.end()
        for kind in ("ident", "quoted", "star", "dot", "comma", "other"):
            val = m.group(kind)
            if val is not None:
                if kind in ("ident", "quoted") and len(val) > 250:
                    # Calcite config parity: identifier max length 250
                    # (AvroSql.scala:47-51)
                    raise AvroSqlError(
                        f"Query is not valid. Identifier exceeds 250 characters: {val[:40]}..."
                    )
                tokens.append((kind, val))
                break
    return tokens


def parse(query: str) -> tuple[list[Field], bool]:
    """Parse the reshape dialect → (projection list, withstructure flag).

    Grammar: ``SELECT item (, item)* [FROM ...ignored]`` with
    ``item := path | path.* | * | path [AS] alias``; identifiers may be
    backtick-quoted. Non-SELECT statements rejected with the reference's
    message (AvroSql.scala:59-63).
    """
    if query is None or not query.strip():
        raise AvroSqlError("Query is not valid. Empty query")
    text, withstructure = split_withstructure(query)
    tokens = _tokenize(text)
    if not tokens or tokens[0][0] != "ident" or tokens[0][1].lower() != "select":
        raise AvroSqlError("Only `select` statements are allowed")
    i = 1
    fields: list[Field] = []
    n = len(tokens)

    def peek():
        return tokens[i] if i < n else (None, None)

    while i < n:
        kind, val = tokens[i]
        if kind == "ident" and val.lower() == "from":
            break  # FROM clause parsed but ignored (AvroSqlTest.scala:258)
        # parse one item
        segments: list[str] = []
        star = False
        if kind == "star":
            star = True
            i += 1
        elif kind in ("ident", "quoted"):
            segments.append(val)
            i += 1
            while i < n and tokens[i][0] == "dot":
                i += 1
                if i >= n:
                    raise AvroSqlError(f"Query is not valid. Dangling '.' after {'.'.join(segments)}")
                k2, v2 = tokens[i]
                if k2 == "star":
                    star = True
                    i += 1
                    break
                if k2 not in ("ident", "quoted"):
                    raise AvroSqlError(f"Query is not valid. Unexpected token '{v2}'")
                segments.append(v2)
                i += 1
        else:
            raise AvroSqlError(f"Query is not valid. Unexpected token '{val}'")

        alias = None
        k2, v2 = peek()
        if k2 == "ident" and v2.lower() == "as":
            i += 1
            k3, v3 = peek()
            if k3 not in ("ident", "quoted"):
                raise AvroSqlError("Query is not valid. Expected alias after AS")
            alias = v3
            i += 1
        elif k2 in ("ident", "quoted") and v2.lower() not in ("from",):
            alias = v2  # bare alias (MySQL lex allows it)
            i += 1

        if star:
            if alias is not None:
                raise AvroSqlError("Query is not valid. `*` cannot be aliased")
            fields.append(Field("*", "*", tuple(segments)))
        else:
            name = segments[-1]
            fields.append(Field(name, alias or name, tuple(segments[:-1])))

        k2, v2 = peek()
        if k2 == "comma":
            i += 1
            continue
        if k2 is None or (k2 == "ident" and v2.lower() == "from"):
            break
        raise AvroSqlError(f"Query is not valid. Unexpected token '{v2}'")

    if not fields:
        raise AvroSqlError("Query is not valid. Empty projection list")
    return fields, withstructure


class NameAllocator:
    """``_N`` suffix disambiguation, mirroring getNextFieldName
    (AvroSchemaSql.scala:161-171): second+ occurrence of a name gets
    ``_1``, ``_2``, ... appended."""

    def __init__(self):
        self._used: set[str] = set()

    def allocate(self, desired: str) -> str:
        if desired not in self._used:
            self._used.add(desired)
            return desired
        i = 1
        while f"{desired}_{i}" in self._used:
            i += 1
        name = f"{desired}_{i}"
        self._used.add(name)
        return name

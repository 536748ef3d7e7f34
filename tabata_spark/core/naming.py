"""Column-naming utilities for the ``NAME[UNIT]`` convention.

Semantics match the reference (plots.py:46-94): columns encode their
unit in square brackets (``ALT[m]``, ``Vz[m/s]``); users address
columns by substring and the first match wins. These are driver-side
helpers over ``df.columns`` — no data is touched.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterable, Sequence

#: Reserved structural columns of the long signal layout — never channels.
STRUCT_COLS = ("record_id", "seq", "ts")


def nameunit(col: str, default_unit: str = "-") -> tuple[str, str]:
    """Split ``'ALT[m]' -> ('ALT', 'm')``; no bracket -> unit ``'-'``.

    Mirrors reference plots.py:46-51 (split on the first ``'['``, strip
    a trailing ``']'``).
    """
    i = col.find("[")
    if i == -1:
        return col, default_unit
    name = col[:i]
    unit = col[i + 1 :]
    if unit.endswith("]"):
        unit = unit[:-1]
    return name, unit


def byunits(cols: Iterable[str], default_unit: str = "-") -> "OrderedDict[str, list[str]]":
    """Group column names by unit: ``{'m': ['ALT[m]'], 'm/s': [...]}``.

    Mirrors reference plots.py:54-65; insertion order preserved.
    """
    out: OrderedDict[str, list[str]] = OrderedDict()
    for c in cols:
        _, unit = nameunit(c, default_unit)
        out.setdefault(unit, []).append(c)
    return out


def get_colname(
    columns: Sequence[str],
    variable: str | None,
    default: str | None = None,
    raise_exception: bool = False,
) -> str | None:
    """Resolve a user-supplied substring to the first matching column.

    ``get_colname(cols, 'ALT') -> 'ALT[m]'``. *Contains* (not prefix)
    match, first hit wins — reference plots.py:68-94 (the
    ``subs = [r for r in columns if variable in r]`` at plots.py:88).
    Falls back to ``default`` (or the first column) when no/empty
    variable; raises ``ValueError`` when asked to and nothing matches.
    """
    columns = list(columns)
    if default is None and columns:
        default = columns[0]
    if not variable:
        return default
    if variable in columns:
        return variable
    subs = [c for c in columns if variable in c]
    if subs:
        return subs[0]
    if raise_exception:
        raise ValueError(f"no column matching {variable!r} in {columns}")
    return default


def channel_columns(columns: Sequence[str]) -> list[str]:
    """All non-structural columns (the signal channels)."""
    return [c for c in columns if c not in STRUCT_COLS]

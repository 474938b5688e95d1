"""Column-width table rendering with parity to the reference CLI's
pretty_select (cli/src/prettyselect.rs:10-103): the `llamadb>` REPL
prints result sets as

    ------------------------
    | album    | artist    |
    ------------------------
    | Big Ones | Aerosmith |
    ------------------------

followed by a blank line, paginated every ``page_length`` rows
(each page re-measures column widths over ITS rows — exactly the
reference's streaming behavior, which never holds more than one page
in memory). Width = max(header, widest cell in the page), one space
of padding each side (prettyselect.rs:16 `padding = 1`); the
zero-row case prints just the boxed header (prettyselect.rs:54-60).

Widths count characters, not bytes (string_width uses chars() —
prettyselect.rs:6-8), so multi-byte names like "Antônio Carlos
Jobim" align the same way they do in the reference's transcript
(Usage.md:109).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator


def render_value(v) -> str:
    """One cell's text: NULL for None, X'…' for byte values (the
    dialect's byte[N] literal form), str() otherwise."""
    if v is None:
        return "NULL"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex().upper() + "'"
    return str(v)


def _width(s: str) -> int:
    return max(len(part) for part in s.split("\n"))


def _separator(table_width: int) -> str:
    return "-" * table_width


def _row(widths: list[int], cells: Iterable[str], padding: int = 1) -> str:
    out = []
    for width, cell in zip(widths, cells):
        out.append("|")
        out.append(" " * padding)
        out.append(cell)
        out.append(" " * (width - len(cell) + padding))
    out.append("|")
    return "".join(out)


def pretty_select(
    column_names: list[str],
    rows: Iterable[Iterable],
    page_length: int = 32,
) -> tuple[str, int]:
    """Render ``rows`` (any cell values; render_value stringifies)
    into the reference's table format. Returns (text, row_count) —
    the caller prints the text and the reference CLI's trailing
    ``{n} rows selected.`` line (cli/src/main.rs:108-109).
    """
    padding = 1
    lines: list[str] = []
    row_count = 0
    it: Iterator = iter(rows)
    while True:
        page: list[list[str]] = []
        for _ in range(page_length):
            try:
                r = next(it)
            except StopIteration:
                break
            cells = [render_value(v) for v in r]
            assert len(cells) == len(column_names)
            page.append(cells)
        if not page:
            break
        row_count += len(page)
        widths = [
            max(_width(column_names[i]), max(_width(r[i]) for r in page))
            for i in range(len(column_names))
        ]
        table_width = sum(widths) + len(widths) * (2 * padding + 1) + 1
        lines.append(_separator(table_width))
        lines.append(_row(widths, column_names, padding))
        lines.append(_separator(table_width))
        for r in page:
            lines.append(_row(widths, r, padding))
        lines.append(_separator(table_width))
        lines.append("")
    if row_count == 0:
        widths = [_width(c) for c in column_names]
        table_width = sum(widths) + len(widths) * (2 * padding + 1) + 1
        lines.append(_separator(table_width))
        lines.append(_row(widths, column_names, padding))
        lines.append(_separator(table_width))
        lines.append("")
    return "\n".join(lines), row_count

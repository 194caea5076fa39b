"""Minimal stdlib xlsx reader (zipfile + ElementTree) for the one-time
A1 ingest — no openpyxl in this environment, and an xlsx file is just a
zip of XML (sharedStrings + per-sheet cell values).

Supports exactly what a sparse string/number matrix needs: inline and
shared strings, numeric cells, 1-based A1 coordinates. Not a general
xlsx implementation.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_CELL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_sheet(path: str, sheet: str = "xl/worksheets/sheet1.xml") -> list[list]:
    """Return the sheet as a dense list-of-rows (None for empty cells)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
        root = ET.fromstring(z.read(sheet))
        cells: dict[tuple[int, int], object] = {}
        max_r = max_c = -1
        for c in root.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}c"):
            ref = c.get("r")
            m = _CELL_RE.fullmatch(ref or "")
            if not m:
                continue
            col, row = _col_index(m.group(1)), int(m.group(2)) - 1
            if c.get("t") == "inlineStr":
                # inline strings carry no <v>: the text lives in <is><t>
                # (possibly split across runs) — skipping on the missing
                # <v> would silently drop every inline-string cell
                is_el = c.find("m:is", _NS)
                if is_el is None:
                    continue
                cells[(row, col)] = "".join(
                    t.text or ""
                    for t in is_el.iter(
                        "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                    )
                )
                max_r, max_c = max(max_r, row), max(max_c, col)
                continue
            v = c.find("m:v", _NS)
            if v is None or v.text is None:
                continue
            if c.get("t") == "s":
                val: object = shared[int(v.text)]
            elif c.get("t") == "str":
                val = v.text
            else:
                try:
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
                except ValueError:
                    val = v.text
            cells[(row, col)] = val
            max_r, max_c = max(max_r, row), max(max_c, col)
        return [
            [cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)
        ]

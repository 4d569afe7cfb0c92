"""Minimal stdlib xlsx reader (zipfile + ElementTree).

The reference commits its IPOPT/MATLAB golden trajectories as xlsx
(``Casadi/1/2/3exemplo.xlsx`` written at ``multiple_shooting_casadi.py:334``,
``single_shooting_v2.py:301``, ``mpctools/multiple_shooting_mpctools.py:150``;
``Inverted_pendulum/Pend_data.xlsx`` read by ``ploting.py``).  This image has
no openpyxl, so a tiny reader handles the subset those files use: one sheet,
inline or shared strings, numeric cells.
"""
from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import numpy as np

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(ref: str) -> int:
    """'B12' -> column index 1."""
    m = re.match(r"([A-Z]+)", ref)
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx(path: str, sheet: str = "xl/worksheets/sheet1.xml"):
    """Read the first worksheet into a dict of column-name -> float array.

    Row 1 is the header; non-numeric data cells become NaN.  A leading
    unnamed index column (pandas ``to_excel`` default) is kept under ``""``.
    """
    with zipfile.ZipFile(path) as z:
        shared = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        root = ET.fromstring(z.read(sheet))
        rows = []
        for row in root.iter(f"{_NS}row"):
            cells = {}
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r", "A1")
                t = c.get("t", "n")
                if t == "inlineStr":
                    txt = "".join(tt.text or "" for tt in c.iter(f"{_NS}t"))
                    cells[_col_index(ref)] = txt
                else:
                    v = c.find(f"{_NS}v")
                    if v is None or v.text is None:
                        continue
                    if t == "s":
                        cells[_col_index(ref)] = shared[int(v.text)]
                    else:
                        cells[_col_index(ref)] = v.text
            rows.append(cells)

    if not rows:
        return {}
    header_row = rows[0]
    ncol = max(max(r.keys(), default=0) for r in rows) + 1
    names = [str(header_row.get(i, "")) for i in range(ncol)]
    out = {}
    for i, name in enumerate(names):
        vals = []
        for r in rows[1:]:
            v = r.get(i, None)
            try:
                vals.append(float(v))
            except (TypeError, ValueError):
                vals.append(np.nan)
        out[name] = np.asarray(vals)
    return out

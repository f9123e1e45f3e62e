"""Structured-data detection over positioned fragments: key-value pairs
(reimplements text/structured/keyvalue.rs; the sibling table detector
lives in kernel/tables.py, multi-column layout in kernel/reading_order.py
— together they cover text/structured/detector.rs's three pattern
families).

Three strategies, applied in order (keyvalue.rs:13-28):
1. colon-separated  — 'Label: Value' inside one fragment (conf 0.95)
2. spatial          — a 2-fragment line with a >20pt horizontal gap
                      (conf 0.70; lines grouped by y within 3.0pt)
3. tabular          — 'Label\\tValue' inside one fragment (conf 0.85)
"""

from __future__ import annotations

import re

_COLON = re.compile(r"^([^:]+):\s*(.+)$", re.S)

Y_LINE_TOLERANCE = 3.0  # keyvalue.rs:73
SPATIAL_MIN_GAP = 20.0  # keyvalue.rs:80


class KeyValuePair:
    __slots__ = ("key", "value", "confidence", "pattern")

    def __init__(self, key, value, confidence, pattern):
        self.key = key
        self.value = value
        self.confidence = confidence
        self.pattern = pattern  # 'colon' | 'spatial' | 'tabular'


def _group_by_y(fragments, tolerance=Y_LINE_TOLERANCE):
    """keyvalue.rs:124-150: sort y DESC then x ASC, group into lines while
    within tolerance of the line's first fragment."""
    if not fragments:
        return []
    ordered = sorted(fragments, key=lambda f: (-f.y, f.x))
    lines = [[ordered[0]]]
    for f in ordered[1:]:
        if abs(f.y - lines[-1][0].y) <= tolerance:
            lines[-1].append(f)
        else:
            lines.append([f])
    return lines


def detect_key_value_pairs(fragments) -> list[KeyValuePair]:
    pairs: list[KeyValuePair] = []
    # 1. colon-separated, per fragment in document order
    for f in fragments:
        m = _COLON.match(f.text)
        if m:
            k, v = m.group(1).strip(), m.group(2).strip()
            if k and v:
                pairs.append(KeyValuePair(k, v, 0.95, "colon"))
    # 2. spatial: exactly-2-fragment lines with a significant gap
    for line in _group_by_y(fragments):
        if len(line) == 2:
            a, b = line
            if b.x - (a.x + a.width) > SPATIAL_MIN_GAP:
                pairs.append(
                    KeyValuePair(
                        a.text.strip(), b.text.strip(), 0.70, "spatial"
                    )
                )
    # 3. tabular: tab inside one fragment
    for f in fragments:
        if "\t" in f.text:
            parts = f.text.split("\t")
            if len(parts) == 2:
                k, v = parts[0].strip(), parts[1].strip()
                if k and v:
                    pairs.append(KeyValuePair(k, v, 0.85, "tabular"))
    return pairs

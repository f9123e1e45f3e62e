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


class ColumnSection:
    """structured/types.rs ColumnSection: one detected column with its
    reading-order text and bounding box."""

    __slots__ = ("column_index", "text", "bbox")

    def __init__(self, column_index, text, bbox):
        self.column_index = column_index
        self.text = text
        self.bbox = bbox  # (x, y, width, height)


MIN_COLUMN_GAP = 20.0  # StructuredDataConfig::default (types.rs:276)


def detect_column_layout(
    fragments, min_column_gap: float = MIN_COLUMN_GAP
) -> list[ColumnSection]:
    """Multi-column layout detection by vertical-gap analysis
    (structured/layout.rs:13-117 detect_column_layout): sort fragment
    x-ranges by start, gaps >= min_column_gap between consecutive
    ranges become boundaries at the gap midpoint, fragments assign to
    the first boundary with x < boundary, each non-empty column sorts
    (y desc, x asc), joins text with ' ', and carries its bbox. Column
    indices are the ORIGINAL slot indices (pre-filter), matching the
    reference's enumerate-then-filter order."""
    if not fragments:
        return []
    x_ranges = sorted((f.x, f.x + f.width) for f in fragments)
    boundaries = []  # x_position values
    for (s1, e1), (s2, _e2) in zip(x_ranges, x_ranges[1:]):
        gap = s2 - e1
        if gap >= min_column_gap:
            boundaries.append(e1 + gap / 2.0)

    def col_of(x):
        for i, bx in enumerate(boundaries):
            if x < bx:
                return i
        return len(boundaries)

    columns = [[] for _ in range(len(boundaries) + 1)]
    for f in fragments:
        columns[col_of(f.x)].append(f)

    out = []
    for idx, col in enumerate(columns):
        if not col:
            continue
        col.sort(key=lambda f: (-f.y, f.x))
        text = " ".join(f.text for f in col)
        min_x = min(f.x for f in col)
        min_y = min(f.y for f in col)
        max_x = max(f.x + f.width for f in col)
        max_y = max(f.y + f.height for f in col)
        out.append(
            ColumnSection(idx, text, (min_x, min_y, max_x - min_x, max_y - min_y))
        )
    return out


def detect_structured_data(
    fragments,
    detect_tables: bool = True,
    detect_key_value: bool = True,
    detect_multi_column: bool = True,
    min_column_gap: float = MIN_COLUMN_GAP,
) -> dict:
    """structured/detector.rs:66 StructuredDataDetector::detect — the
    one-call orchestrator over the three component detectors this
    engine already ships: borderless-table alignment clustering
    (kernel/tables.py detect_borderless_tables stands in for
    structured/table.rs' spatial clustering), key-value patterns, and
    multi-column gap analysis. Returns {'tables': [...],
    'key_value_pairs': [...], 'column_sections': [...]}, each empty
    when its flag is off or input is empty (infallible, like the
    reference)."""
    result = {"tables": [], "key_value_pairs": [], "column_sections": []}
    if not fragments:
        return result
    if detect_tables:
        from .tables import detect_borderless_tables

        result["tables"] = detect_borderless_tables(fragments)
    if detect_key_value:
        result["key_value_pairs"] = detect_key_value_pairs(fragments)
    if detect_multi_column:
        result["column_sections"] = detect_column_layout(
            fragments, min_column_gap
        )
    return result

"""Reading-order strategies over positioned fragments (SURVEY.md A5).

Reimplements oxidize-pdf-core/src/pipeline/reading_order.rs:

- SimpleReadingOrder (reading_order.rs:10-78): greedy Y-chain line
  clustering, then (line, x) sort.
- XYCutReadingOrder (reading_order.rs:81-264): recursive X-Y cut
  (Ha, Haralick, Phillips 1992) — split on the largest whitespace gap,
  vertical (columns) before horizontal (sections), leaves in simple order.

Both operate in-UDF on one page's fragments (never a cluster sort).
"""

from __future__ import annotations

from .layout import TextFragment


def simple_reading_order(
    fragments: list[TextFragment], line_threshold: float = 5.0
) -> list[TextFragment]:
    """Top-to-bottom, left-to-right within Y-chained lines
    (reading_order.rs:31-78)."""
    if not fragments:
        return []
    indexed = sorted(
        ((i, f.y, f.x) for i, f in enumerate(fragments)), key=lambda t: -t[1]
    )
    line_ids = [0] * len(fragments)
    line_id = 0
    prev_y = indexed[0][1]
    for idx, y, _ in indexed:
        if abs(prev_y - y) > line_threshold:
            line_id += 1
        line_ids[idx] = line_id
        prev_y = y
    order = sorted(
        range(len(fragments)), key=lambda i: (line_ids[i], fragments[i].x)
    )
    return [fragments[i] for i in order]


def xycut_reading_order(
    fragments: list[TextFragment], min_gap: float = 20.0
) -> list[TextFragment]:
    """Recursive X-Y cut (reading_order.rs:105-264): vertical split first
    (multi-column), then horizontal, leaves sorted (y desc, x asc)."""
    if len(fragments) <= 1:
        return list(fragments)
    result: list[int] = []
    _xycut(fragments, list(range(len(fragments))), result, min_gap)
    return [fragments[i] for i in result]


def _xycut(
    frags: list[TextFragment], indices: list[int], result: list[int], min_gap: float
) -> None:
    if not indices:
        return
    if len(indices) == 1:
        result.append(indices[0])
        return
    split = _find_vertical_split(frags, indices, min_gap)
    if split is not None:
        left, right = split
        _xycut(frags, left, result, min_gap)
        _xycut(frags, right, result, min_gap)
        return
    split = _find_horizontal_split(frags, indices, min_gap)
    if split is not None:
        top, bottom = split
        _xycut(frags, top, result, min_gap)
        _xycut(frags, bottom, result, min_gap)
        return
    leaf = sorted(indices, key=lambda i: (-frags[i].y, frags[i].x))
    result.extend(leaf)


def _find_vertical_split(frags, indices, min_gap):
    """Largest X-axis whitespace gap (reading_order.rs:162-211)."""
    edges = sorted(
        ((frags[i].x, frags[i].x + frags[i].width, i) for i in indices),
        key=lambda t: t[0],
    )
    max_gap = 0.0
    split_x = 0.0
    max_right = edges[0][1]
    for prev, nxt in zip(edges, edges[1:]):
        gap = nxt[0] - max_right
        if gap > max_gap:
            max_gap = gap
            split_x = max_right + gap / 2.0
        max_right = max(max_right, nxt[1])
    if max_gap < min_gap:
        return None
    left = [i for i in indices if frags[i].x + frags[i].width / 2.0 < split_x]
    right = [i for i in indices if frags[i].x + frags[i].width / 2.0 >= split_x]
    if not left or not right:
        return None
    return (left, right)


def _find_horizontal_split(frags, indices, min_gap):
    """Largest Y-axis whitespace gap (reading_order.rs:214-264)."""
    by_y = sorted(
        ((frags[i].y, frags[i].y + frags[i].height, i) for i in indices),
        key=lambda t: -t[0],
    )
    max_gap = 0.0
    split_y = 0.0
    min_bottom = by_y[0][0]
    for prev, nxt in zip(by_y, by_y[1:]):
        gap = min_bottom - nxt[1]
        if gap > max_gap:
            max_gap = gap
            split_y = nxt[1] + gap / 2.0
        min_bottom = min(min_bottom, nxt[0])
    if max_gap < min_gap:
        return None
    top = [i for i in indices if frags[i].y >= split_y]
    bottom = [i for i in indices if frags[i].y < split_y]
    if not top or not bottom:
        return None
    return (top, bottom)

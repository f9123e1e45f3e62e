"""Bordered-table detection over vector lines + text fragments
(reimplements text/table_detection.rs:60-520).

Pipeline: cluster horizontal line Ys and vertical line Xs within an
alignment tolerance → grid of row/column boundaries → cells between
adjacent boundaries → assign each text fragment to the cell containing its
center point. Row 0 is the TOP row (rows reversed after clustering,
table_detection.rs:352)."""

from __future__ import annotations

from .graphics import ExtractedGraphics

MIN_ROWS = 2  # minimum horizontal grid LINES (TableDetectionConfig:68)
MIN_COLUMNS = 2  # minimum vertical grid LINES
ALIGNMENT_TOLERANCE = 2.0  # points (table_detection.rs:86)
MIN_TABLE_AREA = 1000.0  # square points


class TableCell:
    __slots__ = ("row", "column", "x", "y", "width", "height", "text")

    def __init__(self, row, column, x, y, width, height):
        self.row = row
        self.column = column
        self.x = x
        self.y = y
        self.width = width
        self.height = height
        self.text = ""

    def contains_point(self, px, py) -> bool:
        return (
            self.x <= px <= self.x + self.width
            and self.y <= py <= self.y + self.height
        )


class DetectedTable:
    __slots__ = ("cells", "rows", "columns", "bbox")

    def __init__(self, cells, rows, columns, bbox):
        self.cells = cells  # row-major
        self.rows = rows
        self.columns = columns
        self.bbox = bbox  # (x, y, width, height)

    def get_cell(self, row, col):
        for c in self.cells:
            if c.row == row and c.column == col:
                return c
        return None


def _cluster(positions: list[float]) -> list[float]:
    """cluster_lines_by_position (table_detection.rs:359-409): sort, group
    while within ALIGNMENT_TOLERANCE of the running cluster mean, return
    cluster means."""
    if not positions:
        return []
    positions = sorted(p for p in positions)
    clusters: list[list[float]] = [[positions[0]]]
    for pos in positions[1:]:
        last = clusters[-1]
        mean = sum(last) / len(last)
        if abs(pos - mean) <= ALIGNMENT_TOLERANCE:
            last.append(pos)
        else:
            clusters.append([pos])
    return [sum(c) / len(c) for c in clusters]


def detect_tables(graphics: ExtractedGraphics, fragments) -> list:
    """TableDetector::detect (table_detection.rs:268-298) restricted to the
    reference's implemented scope: bordered tables (detect_borderless is
    false by default there and the borderless branch is a stub)."""
    if not graphics.has_table_structure():
        return []
    rows = _cluster([ln.y1 for ln in graphics.horizontal_lines()])
    cols = _cluster([ln.x1 for ln in graphics.vertical_lines()])
    rows.reverse()  # row 0 at the top (highest Y)
    if len(rows) < MIN_ROWS or len(cols) < MIN_COLUMNS:
        return []
    n_rows = len(rows) - 1
    n_cols = len(cols) - 1
    cells: list[TableCell] = []
    for r in range(n_rows):
        y1, y2 = rows[r], rows[r + 1]
        row_y = min(y1, y2)
        row_h = abs(y2 - y1)
        for c in range(n_cols):
            col_x = cols[c]
            col_w = abs(cols[c + 1] - col_x)
            cells.append(TableCell(r, c, col_x, row_y, col_w, row_h))
    # assign_text_to_cells (table_detection.rs:453-485): fragment center
    # containment, texts joined with a single space in fragment order
    for cell in cells:
        texts = [
            f.text
            for f in fragments
            if cell.contains_point(f.x + f.width / 2.0, f.y + f.height / 2.0)
        ]
        if texts:
            cell.text = " ".join(texts)
    min_x, max_x = cols[0], cols[-1]
    min_y, max_y = min(rows[0], rows[-1]), max(rows[0], rows[-1])
    bbox = (min_x, min_y, max_x - min_x, max_y - min_y)
    if bbox[2] * bbox[3] < MIN_TABLE_AREA:
        return []
    return [DetectedTable(cells, n_rows, n_cols, bbox)]


# borderless detection thresholds (this engine's implementation of the
# reference's declared-but-stubbed detect_borderless config —
# table_detection.rs:77 + the :283 roadmap comment 'alignment patterns and
# whitespace analysis')
BORDERLESS_MIN_COL_HITS = 3  # a column must repeat across >= this many rows
BORDERLESS_MIN_OCCUPANCY = 0.6  # filled cells / (rows*cols)


def detect_borderless_tables(fragments) -> list:
    """Alignment-based (borderless) table detection: columns are clusters
    of fragment LEFT EDGES that repeat across rows, rows are clusters of
    baselines restricted to those columns. Deterministic: the same 2pt
    tolerance clustering as the bordered path; rejects anything without
    >= 2 repeating columns, >= 2 multi-column rows, and >= 60% cell
    occupancy (left-aligned prose has ONE x cluster and dies at the
    column gate). Row 0 is the top row."""
    frags = [f for f in fragments if f.text.strip()]
    if not frags:
        return []
    col_means = [
        m
        for m in _cluster([f.x for f in frags])
        if sum(1 for f in frags if abs(f.x - m) <= ALIGNMENT_TOLERANCE)
        >= BORDERLESS_MIN_COL_HITS
    ]
    if len(col_means) < 2:
        return []

    def col_of(f):
        for ci, m in enumerate(col_means):
            if abs(f.x - m) <= ALIGNMENT_TOLERANCE:
                return ci
        return None

    members = [(f, col_of(f)) for f in frags]
    members = [(f, c) for f, c in members if c is not None]
    row_means = _cluster([f.y for f, _ in members])
    row_means.sort(reverse=True)  # top row first

    def row_of(f):
        for ri, m in enumerate(row_means):
            if abs(f.y - m) <= ALIGNMENT_TOLERANCE:
                return ri
        return None

    grid: dict[tuple[int, int], list] = {}
    for f, c in members:
        r = row_of(f)
        if r is not None:
            grid.setdefault((r, c), []).append(f)
    # keep rows that span >= 2 columns (single-column lines are prose)
    kept_rows = sorted(
        {r for r, _ in grid if len({c for rr, c in grid if rr == r}) >= 2}
    )
    if len(kept_rows) < 2:
        return []
    row_remap = {r: i for i, r in enumerate(kept_rows)}
    n_rows, n_cols = len(kept_rows), len(col_means)
    occupied = sum(1 for (r, _) in grid if r in row_remap)
    if occupied / (n_rows * n_cols) < BORDERLESS_MIN_OCCUPANCY:
        return []
    cells = []
    for r in kept_rows:
        for c in range(n_cols):
            fs = grid.get((r, c), [])
            y_mean = row_means[r]
            cell = TableCell(
                row_remap[r], c, col_means[c], y_mean, 0.0, 0.0
            )
            cell.text = " ".join(f.text for f in fs)
            cells.append(cell)
    xs = [f.x for f, _ in members]
    ys = [row_means[r] for r in kept_rows]
    bbox = (min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys))
    return [DetectedTable(cells, n_rows, n_cols, bbox)]


def detect_page_tables(content: bytes, fragments) -> list:
    """Convenience: parse a page content stream, extract graphics, detect
    tables against the page's positioned fragments."""
    from .content import parse_content
    from .graphics import extract_graphics

    return detect_tables(extract_graphics(parse_content(content)), fragments)

"""Vector-graphics extraction: content-stream path operators → line
segments (reimplements graphics/extraction.rs:60-420).

Like the reference's GraphicsExtractor, this is a SEPARATE pass over the
parsed operations (ContentParser::parse → process_operations), not part of
the text interpreter — table detection consumes its output together with
the text fragments the interpreter already produces.
"""

from __future__ import annotations

_ORIENT_TOL = 0.1  # extraction.rs:126 compute_orientation
MIN_LINE_LENGTH = 1.0  # ExtractionConfig::default (extraction.rs:215)

H = "h"
V = "v"
D = "d"


class VectorLine:
    __slots__ = ("x1", "y1", "x2", "y2", "orientation")

    def __init__(self, x1, y1, x2, y2):
        self.x1 = x1
        self.y1 = y1
        self.x2 = x2
        self.y2 = y2
        dx = abs(x2 - x1)
        dy = abs(y2 - y1)
        if dy < _ORIENT_TOL:
            self.orientation = H
        elif dx < _ORIENT_TOL:
            self.orientation = V
        else:
            self.orientation = D

    def length(self) -> float:
        dx = self.x2 - self.x1
        dy = self.y2 - self.y1
        return (dx * dx + dy * dy) ** 0.5


class ExtractedGraphics:
    """extraction.rs:155-200."""

    __slots__ = ("lines", "horizontal_count", "vertical_count")

    def __init__(self):
        self.lines: list[VectorLine] = []
        self.horizontal_count = 0
        self.vertical_count = 0

    def add_line(self, line: VectorLine) -> None:
        if line.orientation == H:
            self.horizontal_count += 1
        elif line.orientation == V:
            self.vertical_count += 1
        self.lines.append(line)

    def horizontal_lines(self):
        return [ln for ln in self.lines if ln.orientation == H]

    def vertical_lines(self):
        return [ln for ln in self.lines if ln.orientation == V]

    def has_table_structure(self) -> bool:
        """≥2 horizontal and ≥2 vertical lines (extraction.rs:197)."""
        return self.horizontal_count >= 2 and self.vertical_count >= 2


def extract_graphics(ops) -> ExtractedGraphics:
    """Process parsed content operations (parse_content tuples) into line
    segments (extraction.rs process_operations:288-360):

    - m/l build the current path (points CTM-transformed at construction)
    - re adds its 4 edges IMMEDIATELY (extraction.rs:330 — the reference
      does not wait for a paint operator on rectangles)
    - S/s emit the pending path as stroked lines; f/f* discard it
      (stroked_only default); all other paints are ignored like the
      reference's catch-all arm
    - q/Q save/restore the CTM; cm composes
    - path lines shorter than MIN_LINE_LENGTH are dropped; re edges are
      added via add_line directly, bypassing the filter (same quirk)
    """
    g = ExtractedGraphics()
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    saved: list[tuple] = []
    path: list[tuple] = []  # (x1, y1, x2, y2) in device space
    cur = None  # current point (device)
    start = None  # subpath start (device)

    def tp(x, y):
        return (
            x * ctm[0] + y * ctm[2] + ctm[4],
            x * ctm[1] + y * ctm[3] + ctm[5],
        )

    for op in ops:
        name = op[0]
        if name == "m" and len(op) == 3:
            cur = tp(op[1], op[2])
            start = cur
        elif name == "l" and len(op) == 3:
            p = tp(op[1], op[2])
            if cur is not None:
                path.append((cur[0], cur[1], p[0], p[1]))
            cur = p
        elif name == "re" and len(op) == 5:
            x, y, w, hh = op[1], op[2], op[3], op[4]
            p1 = tp(x, y)
            p2 = tp(x + w, y)
            p3 = tp(x + w, y + hh)
            p4 = tp(x, y + hh)
            g.add_line(VectorLine(p1[0], p1[1], p2[0], p2[1]))
            g.add_line(VectorLine(p2[0], p2[1], p3[0], p3[1]))
            g.add_line(VectorLine(p3[0], p3[1], p4[0], p4[1]))
            g.add_line(VectorLine(p4[0], p4[1], p1[0], p1[1]))
            cur = p1
            start = p1
        elif name == "h":
            if cur is not None and start is not None and cur != start:
                path.append((cur[0], cur[1], start[0], start[1]))
                cur = start
        elif name == "S" or name == "s":
            if (
                name == "s"
                and cur is not None
                and start is not None
                and cur != start
            ):
                path.append((cur[0], cur[1], start[0], start[1]))
            for x1, y1, x2, y2 in path:
                ln = VectorLine(x1, y1, x2, y2)
                if ln.orientation == D:
                    continue  # extract_diagonals=False default
                if ln.length() < MIN_LINE_LENGTH:
                    continue
                g.add_line(ln)
            path = []
            cur = start = None
        elif name == "f" or name == "F" or name == "f*":
            path = []  # stroked_only: fills discard the path unextracted
            cur = start = None
        elif name == "cm" and len(op) == 7:
            a, b, c, d, e, f = op[1:7]
            ctm = (
                a * ctm[0] + b * ctm[2],
                a * ctm[1] + b * ctm[3],
                c * ctm[0] + d * ctm[2],
                c * ctm[1] + d * ctm[3],
                e * ctm[0] + f * ctm[2] + ctm[4],
                e * ctm[1] + f * ctm[3] + ctm[5],
            )
        elif name == "q":
            saved.append(ctm)
        elif name == "Q":
            if saved:
                ctm = saved.pop()
    return g

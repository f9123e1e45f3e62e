"""Layout reconstruction: positioned fragments → sorted/merged lines and
paragraphs (the reference's ordered-aggregation stage, SURVEY.md §2.6).

Reimplements (in-UDF, per page):

- TextFragment model:           oxidize-pdf-core/src/text/extraction.rs:118-149
- parse_font_style:             extraction.rs:293-330
- A1 sort_and_merge_fragments (Y-band quantized total order) + column
  detection:                    extraction.rs:1457-1556
- A2 merge_close_fragments (kerning-artifact merge with the
  reconstruct-path Y tolerance): extraction.rs:1598-1669
- A3 merge_into_lines (row-id pre-pass, tagged/emission-order decision,
  font-anchored space threshold): extraction.rs:400-520; assign_row_ids
  2293-2329; line_prefers_emission_order 2348-2365
- A4 merge_into_paragraphs (median-height gap, hyphen join):
  extraction.rs:570-636
- reconstruct_text_from_fragments: extraction.rs:1558-1596
- standard_14_space_width:      extraction.rs:2373-2389
"""

from __future__ import annotations

import math


class TextFragment:
    """Positioned text run (extraction.rs:118-149)."""

    __slots__ = (
        "text",
        "x",
        "y",
        "width",
        "height",
        "font_size",
        "font_name",
        "is_bold",
        "is_italic",
        "color",
        "mcid",
        "struct_tag",
    )

    def __init__(
        self,
        text: str,
        x: float = 0.0,
        y: float = 0.0,
        width: float = 0.0,
        height: float = 0.0,
        font_size: float = 0.0,
        font_name: str | None = None,
        is_bold: bool = False,
        is_italic: bool = False,
        color=None,
        mcid: int | None = None,
        struct_tag: str | None = None,
    ):
        self.text = text
        self.x = x
        self.y = y
        self.width = width
        self.height = height
        self.font_size = font_size
        self.font_name = font_name
        self.is_bold = is_bold
        self.is_italic = is_italic
        self.color = color
        self.mcid = mcid
        self.struct_tag = struct_tag

    def clone(self) -> "TextFragment":
        return TextFragment(
            self.text, self.x, self.y, self.width, self.height, self.font_size,
            self.font_name, self.is_bold, self.is_italic, self.color,
            self.mcid, self.struct_tag,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextFragment({self.text!r} @ {self.x},{self.y} w={self.width})"


def _cscan_mod():
    """The loaded C kernel (or None) — lazy import to avoid the
    layout ↔ content module cycle (content's setup imports TextFragment
    from here)."""
    from .content import _CSCAN

    return _CSCAN


def parse_font_style(font_name: str) -> tuple[bool, bool]:
    """extraction.rs:293-330."""
    lower = font_name.lower()
    is_bold = (
        "bold" in lower or "-b" in lower or " b " in lower or lower.endswith(" b")
    )
    is_italic = (
        "italic" in lower
        or "oblique" in lower
        or "-i" in lower
        or " i " in lower
        or lower.endswith(" i")
    )
    return (is_bold, is_italic)


def standard_14_space_width(base_font: str) -> float | None:
    """Adobe Core-14 space advances w/ subset-prefix strip + substitutes
    (extraction.rs:2373-2389)."""
    name = base_font.rsplit("+", 1)[-1]
    lower = name.lower()
    if "courier" in lower:
        return 600.0
    if "helvetica" in lower or "arial" in lower:
        return 278.0
    if "times" in lower:
        return 250.0
    if lower == "symbol":
        return 250.0
    if "zapfdingbats" in lower or "dingbats" in lower:
        return 278.0
    return None


def assign_row_ids(fragments: list[TextFragment]) -> list[int]:
    """Y-up-jump row ids (extraction.rs:2293-2329)."""
    result: list[int] = []
    row_id = 0
    prev_y: float | None = None
    for frag in fragments:
        if prev_y is not None:
            delta = frag.y - prev_y
            threshold = max(frag.font_size * 0.5, 2.0)
            if delta > threshold:
                row_id += 1
        result.append(row_id)
        prev_y = frag.y
    return result


def line_prefers_emission_order(line: list[tuple[int, TextFragment]]) -> bool:
    """No DISJOINT backward x-step in emission order (extraction.rs:2348)."""
    if len(line) < 2:
        return True
    em = sorted(line, key=lambda t: t[0])
    min_start = em[0][1].x
    for _, f in em[1:]:
        end = f.x + f.width
        if end <= min_start:
            return False
        min_start = min(min_start, f.x)
    return True


class LayoutProcessor:
    """Option-driven layout passes, mirroring TextExtractor's layout_finalize
    (extraction.rs:750-783)."""

    def __init__(self, options, fonts=None):
        self.options = options
        self.fonts = fonts or {}

    # -- A1 ------------------------------------------------------------------

    def sort_and_merge_fragments(self, fragments: list[TextFragment]) -> None:
        """In-place sort by quantized Y band desc then X (extraction.rs:1457)."""
        threshold = self.options.newline_threshold

        def key(f: TextFragment):
            band = round(-f.y / threshold) if threshold > 0.0 else -f.y
            return (band, f.x)

        fragments.sort(key=key)
        if self.options.detect_columns:
            self._detect_and_sort_columns(fragments)

    def _detect_and_sort_columns(self, fragments: list[TextFragment]) -> None:
        """extraction.rs:1490-1556."""
        lines: list[list[TextFragment]] = []
        current: list[TextFragment] = []
        last_y = math.inf
        for frag in fragments:
            if abs(last_y - frag.y) > self.options.newline_threshold and current:
                lines.append(current)
                current = []
            current.append(frag)
            last_y = frag.y
        if current:
            lines.append(current)

        boundaries = [0.0]
        for line in lines:
            for i in range(len(line) - 1):
                gap = line[i + 1].x - (line[i].x + line[i].width)
                if gap > self.options.column_threshold:
                    boundary = line[i].x + line[i].width + gap / 2.0
                    if not any(abs(b - boundary) < 10.0 for b in boundaries):
                        boundaries.append(boundary)
        boundaries.sort()
        if len(boundaries) > 1:

            def col_of(f: TextFragment) -> int:
                for i, b in enumerate(boundaries):
                    if f.x < b:
                        return i - 1
                return len(boundaries) - 1

            fragments.sort(key=lambda f: (col_of(f), -f.y))

    # -- A2 ------------------------------------------------------------------

    def merge_close_fragments(
        self, fragments: list[TextFragment]
    ) -> list[TextFragment]:
        """Kerning-artifact merge (extraction.rs:1598-1669). When the C
        kernel produced the fragments (CFrag), the linear pass runs in C
        (merge_close, _cscan.c) with this method's pure-Python body as
        the pinned authority (test_cscan_differential); any non-CFrag
        element bails to Python."""
        if not fragments:
            return []
        ck = _cscan_mod()
        if ck is not None:
            out = ck.merge_close(
                fragments,
                bool(self.options.reconstruct_paragraphs),
                self.space_gap_threshold,
            )
            if out is not None:
                return out
        merged: list[TextFragment] = []
        current = fragments[0].clone()
        for frag in fragments[1:]:
            y_diff = abs(current.y - frag.y)
            x_gap = frag.x - (current.x + current.width)
            if self.options.reconstruct_paragraphs:
                base = 0.5 * min(current.font_size, frag.font_size)
                y_tol = base if base > 0.0 else 1.0
            else:
                y_tol = 1.0
            should_merge = (
                y_diff < y_tol
                and x_gap >= 0.0
                and x_gap < frag.font_size * 0.5
                and current.mcid == frag.mcid
            )
            if should_merge:
                if x_gap > self.space_gap_threshold(frag):
                    current.text += " "
                current.text += frag.text
                current.width = (frag.x + frag.width) - current.x
            else:
                merged.append(current)
                current = frag.clone()
        merged.append(current)
        return merged

    # -- font-anchored space metrics (extraction.rs:497-527) ------------------

    def font_space_advance(
        self, font_name: str | None, font_size: float
    ) -> float | None:
        if font_name is None:
            return None
        info = self.fonts.get(font_name)
        if info is None:
            return None
        if info.widths is not None:
            first = info.first_char if info.first_char is not None else 0
            if first <= 32 and 0 <= 32 - first < len(info.widths):
                w = info.widths[32 - first]
                if w > 0.0:
                    return w / 1000.0 * font_size
        em = standard_14_space_width(info.name)
        return em / 1000.0 * font_size if em is not None else None

    def space_gap_threshold(self, frag: TextFragment) -> float:
        adv = self.font_space_advance(frag.font_name, frag.font_size)
        if adv is not None and adv > 0.0:
            return 0.5 * adv
        return self.options.space_threshold * frag.font_size

    # -- A3 ------------------------------------------------------------------

    def merge_into_lines(self, fragments: list[TextFragment]) -> list[TextFragment]:
        """Baseline grouping w/ row-id + per-line order decision
        (extraction.rs:400-495)."""
        if not fragments:
            return []
        row_ids = assign_row_ids(fragments)
        is_tagged = any(f.mcid is not None for f in fragments)

        indexed = [
            (rid, idx, f) for rid, (idx, f) in zip(row_ids, enumerate(fragments))
        ]
        indexed.sort(key=lambda t: (t[0], -t[2].y, t[2].x))

        lines: list[list[tuple[int, TextFragment]]] = []
        last_seen_row_id: int | None = None
        for rid, idx, frag in indexed:
            same_batch = last_seen_row_id == rid
            placed = False
            if same_batch and lines:
                head = lines[-1][0][1]
                tol = min(head.height, frag.height) * 0.2
                if abs(head.y - frag.y) < tol and head.mcid == frag.mcid:
                    placed = True
            if placed:
                lines[-1].append((idx, frag))
            else:
                lines.append([(idx, frag)])
                last_seen_row_id = rid

        out = []
        for line in lines:
            if is_tagged or line_prefers_emission_order(line):
                line.sort(key=lambda t: t[0])
            else:
                line.sort(key=lambda t: t[1].x)
            out.append(self._build_line_fragment([f for _, f in line]))
        return out

    def _build_line_fragment(self, line: list[TextFragment]) -> TextFragment:
        """extraction.rs:529-568."""
        head = line[0]
        parts: list[str] = []
        x_min, x_max = head.x, head.x + head.width
        y_min, y_max = head.y, head.y + head.height
        for i, frag in enumerate(line):
            if i > 0:
                prev = line[i - 1]
                gap = frag.x - (prev.x + prev.width)
                if gap > self.space_gap_threshold(frag):
                    parts.append(" ")
            parts.append(frag.text)
            x_min = min(x_min, frag.x)
            x_max = max(x_max, frag.x + frag.width)
            y_min = min(y_min, frag.y)
            y_max = max(y_max, frag.y + frag.height)
        return TextFragment(
            "".join(parts), x_min, y_min, x_max - x_min, y_max - y_min,
            head.font_size, head.font_name, head.is_bold, head.is_italic,
            head.color, head.mcid, head.struct_tag,
        )

    # -- A4 ------------------------------------------------------------------

    def merge_into_paragraphs(self, lines: list[TextFragment]) -> list[TextFragment]:
        """Median-height paragraph grouping + hyphen join (extraction.rs:570)."""
        if not lines:
            return []
        heights = sorted(ln.height for ln in lines)
        median_h = heights[len(heights) // 2]
        max_gap = median_h * 1.5

        paragraphs: list[TextFragment] = []
        current = lines[0].clone()
        for line in lines[1:]:
            gap = current.y - (line.y + line.height)
            if gap < 0.0 or gap > max_gap or current.mcid != line.mcid:
                paragraphs.append(current)
                current = line.clone()
                continue
            if self.options.merge_hyphenated and current.text.endswith("-"):
                joined = current.text[:-1] + line.text
            else:
                joined = current.text + "\n" + line.text
            x_min = min(current.x, line.x)
            x_max = max(current.x + current.width, line.x + line.width)
            y_min = min(current.y, line.y)
            y_max = max(current.y + current.height, line.y + line.height)
            current = TextFragment(
                joined, x_min, y_min, x_max - x_min, y_max - y_min,
                current.font_size, current.font_name, current.is_bold,
                current.is_italic, current.color, current.mcid,
                current.struct_tag,
            )
        paragraphs.append(current)
        return paragraphs

    # -- text rebuild ----------------------------------------------------------

    def reconstruct_text_from_fragments(
        self, fragments: list[TextFragment]
    ) -> str:
        """extraction.rs:1558-1596. The rebuild loop runs in C over CFrag
        lists (reconstruct_text, _cscan.c); the Python body below is the
        pinned authority."""
        merged = self.merge_close_fragments(fragments)
        ck = _cscan_mod()
        if ck is not None:
            r = ck.reconstruct_text(
                merged,
                self.options.newline_threshold,
                self.options.space_threshold,
                bool(self.options.merge_hyphenated),
            )
            if r is not None:
                return r
        parts: list[str] = []
        last_y = math.inf
        last_x = 0.0
        last_hyphen = False
        for frag in merged:
            y_diff = abs(last_y - frag.y)
            if parts and y_diff > self.options.newline_threshold:
                if self.options.merge_hyphenated and last_hyphen:
                    if parts and parts[-1].endswith("-"):
                        parts[-1] = parts[-1][:-1]
                else:
                    parts.append("\n")
            elif parts:
                x_gap = frag.x - last_x
                if x_gap > self.options.space_threshold * frag.font_size:
                    parts.append(" ")
            parts.append(frag.text)
            last_hyphen = frag.text.endswith("-")
            last_y = frag.y
            last_x = frag.x + frag.width
        return "".join(parts)

    # -- the finalize sequence (extraction.rs:750-783) --------------------------

    def finalize(
        self, fragments: list[TextFragment], extracted_text: str,
        preserve_layout: bool, sort_by_position: bool, reconstruct_paragraphs: bool,
    ) -> tuple[list[TextFragment], str]:
        if sort_by_position and not reconstruct_paragraphs and fragments:
            self.sort_and_merge_fragments(fragments)
        if preserve_layout and fragments:
            fragments = self.merge_close_fragments(fragments)
        if reconstruct_paragraphs and fragments:
            lines = self.merge_into_lines(fragments)
            fragments = self.merge_into_paragraphs(lines)
        if preserve_layout and fragments:
            extracted_text = self.reconstruct_text_from_fragments(fragments)
        return fragments, extracted_text

"""Stateful content-stream interpretation → ordered span emission.

Reimplements the reference's per-page stateful scan (its "window function",
SURVEY.md §2.5) with exact threshold parity:

- TextState machine + defaults:  oxidize-pdf-core/src/text/extraction.rs:212-291
- op handlers:                   extraction.rs:821-1317 (BT/ET 824-833,
  Tm 840, Td 849, T* 858, Tj 867-935, TJ 940-1030, ' 1035, " 1091,
  Tf/TL/Tc/Tw/Tz/Ts/Tr 1151-1178, cm 1181, q/Q 1205-1217,
  g/rg/k 1220-1241, BMC/BDC/EMC 1244-1311, Do 1313-1392)
- space/newline synthesis:       extraction.rs:874-883 (dy > newline_threshold
  → '\\n', else dx > space_threshold*font_size → ' '); ShowText only
- TJ implicit space:             extraction.rs:976-1029 (tx > tj_space_threshold
  *font_size, text non-empty, no double space)
- Artifact gate:                 skip_artifact_text extraction.rs:1869-1880
- Form XObject recursion:        extraction.rs:1313-1456, depth cap 12
- matrix math:                   multiply_matrix/text_origin extraction.rs:1958-1976

Behavioral notes mirrored deliberately:
- ``TD`` is parsed but has NO extraction effect (the reference's op match
  lacks a MoveTextSetLeading arm — extraction.rs ``_ => {}`` fall-through).
- Default options (extraction.rs:73-89) run with preserve_layout=False, so
  fragments/layout passes never fire; extracted text is the emission-order
  synthesis stream. Our spans segment that stream at image-capture points.
- Image XObjects and inline images become ``kind='image'`` spans at their
  ``Do``/``BI`` sites (extract_images.rs:195-284; reference capture only).
"""

from __future__ import annotations

from .content import parse_content
from .fonts import (
    FontInfo,
    calculate_text_width_from_codes,
    decode_text,
    extract_page_fonts,
)
from .objects import Ref, Stream

MAX_XOBJECT_DEPTH = 12

IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


class ExtractionOptions:
    """extraction.rs:73-89 defaults."""

    __slots__ = (
        "space_threshold",
        "tj_space_threshold",
        "newline_threshold",
        "include_artifacts",
    )

    def __init__(
        self,
        space_threshold: float = 0.3,
        tj_space_threshold: float = 0.2,
        newline_threshold: float = 10.0,
        include_artifacts: bool = False,
    ):
        self.space_threshold = space_threshold
        self.tj_space_threshold = tj_space_threshold
        self.newline_threshold = newline_threshold
        self.include_artifacts = include_artifacts


def _mul(a, b):
    """multiply_matrix (extraction.rs:1964): row-vector convention, a then b."""
    return (
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    )


class _State:
    __slots__ = (
        "text_matrix",
        "text_line_matrix",
        "ctm",
        "leading",
        "char_space",
        "word_space",
        "horizontal_scale",
        "text_rise",
        "font_size",
        "font_name",
        "render_mode",
        "saved",
        "mc_stack",  # list of (tag, is_artifact)
    )

    def __init__(self):
        self.text_matrix = IDENTITY
        self.text_line_matrix = IDENTITY
        self.ctm = IDENTITY
        self.leading = 0.0
        self.char_space = 0.0
        self.word_space = 0.0
        self.horizontal_scale = 100.0
        self.text_rise = 0.0
        self.font_size = 0.0
        self.font_name: str | None = None
        self.render_mode = 0
        self.saved: list[tuple] = []
        self.mc_stack: list[tuple[str, bool]] = []

    def origin(self) -> tuple[float, float]:
        """text_origin (extraction.rs:1958): (Tm × CTM)(0,0)."""
        m = _mul(self.text_matrix, self.ctm)
        return (m[4], m[5])

    def in_artifact(self) -> bool:
        return any(a for _, a in self.mc_stack)


class PageExtraction:
    """Result of one page: interleaved text/image span segments."""

    __slots__ = ("spans", "text")

    def __init__(self):
        self.spans: list[tuple[str, str, str | None]] = []  # (kind, text, media_ref)
        self.text = ""


class Interpreter:
    """Per-page interpreter. ``reader`` may be None for bare content streams
    (then Do targets nothing and fonts come from ``fonts``)."""

    def __init__(
        self,
        reader=None,
        fonts: dict[str, FontInfo] | None = None,
        options: ExtractionOptions | None = None,
        page_index: int = 0,
    ):
        self.reader = reader
        self.fonts: dict[str, FontInfo] = fonts or {}
        self.options = options or ExtractionOptions()
        self.page_index = page_index
        self.state = _State()
        self.in_text = False
        self.last_x = 0.0
        self.last_y = 0.0
        self.text_parts: list[str] = []  # accumulated extracted_text
        self.out = PageExtraction()
        self._flushed_len = 0  # chars of text already flushed into spans
        self._inline_idx = 0
        self._total = 0  # total chars accumulated (extracted_text length)
        self._last_char = ""  # last accumulated char, for ends_with(' ')

    def _append(self, s: str) -> None:
        if s:
            self.text_parts.append(s)
            self._total += len(s)
            self._last_char = s[-1]

    # -- span segmentation ----------------------------------------------

    def _flush_text(self) -> None:
        full = "".join(self.text_parts)
        seg = full[self._flushed_len :]
        if seg:
            self.out.spans.append(("text", seg, None))
            self._flushed_len = len(full)

    def _emit_image(self, media_ref: str) -> None:
        self._flush_text()
        self.out.spans.append(("image", "", media_ref))

    def finalize(self) -> PageExtraction:
        self._flush_text()
        self.out.text = "".join(self.text_parts)
        return self.out

    # -- text helpers ------------------------------------------------------

    def _skip_artifact(self) -> bool:
        return not self.options.include_artifacts and self.state.in_artifact()

    def _show_text(self, text_bytes: bytes) -> None:
        """ShowText / Tj (extraction.rs:867-935)."""
        st = self.state
        decoded = decode_text(text_bytes, st.font_name, self.fonts)
        x, y = st.origin()
        skip = self._skip_artifact()
        if not skip and self._total:
            dx = x - self.last_x
            dy = abs(y - self.last_y)
            if dy > self.options.newline_threshold:
                self._append("\n")
            elif dx > self.options.space_threshold * st.font_size:
                self._append(" ")
        if not skip:
            self._append(decoded)
        info = self.fonts.get(st.font_name) if st.font_name else None
        width = calculate_text_width_from_codes(text_bytes, decoded, st.font_size, info)
        self.last_x = x + width
        self.last_y = y
        tx = width * st.horizontal_scale / 100.0
        st.text_matrix = _mul((1.0, 0.0, 0.0, 1.0, tx, 0.0), st.text_matrix)

    def _show_text_array(self, elements: list[tuple]) -> None:
        """ShowTextArray / TJ (extraction.rs:940-1030)."""
        st = self.state
        opts = self.options
        for kind, val in elements:
            if kind == "t":
                decoded = decode_text(val, st.font_name, self.fonts)
                if not self._skip_artifact():
                    self._append(decoded)
                info = self.fonts.get(st.font_name) if st.font_name else None
                width = calculate_text_width_from_codes(
                    val, decoded, st.font_size, info
                )
                tx = width * st.horizontal_scale / 100.0
                st.text_matrix = _mul((1.0, 0.0, 0.0, 1.0, tx, 0.0), st.text_matrix)
            else:  # spacing adjustment
                tx = -val / 1000.0 * st.font_size
                if (
                    not self._skip_artifact()
                    and tx > opts.tj_space_threshold * st.font_size
                    and self._total
                    and self._last_char != " "
                ):
                    # implicit-space synthesis, no doubling (extraction.rs:976)
                    self._append(" ")
                st.text_matrix = _mul((1.0, 0.0, 0.0, 1.0, tx, 0.0), st.text_matrix)

    def _next_line_show(self, text_bytes: bytes) -> None:
        """' operator (extraction.rs:1035-1089): T* then show, '\\n' joined."""
        st = self.state
        nm = _mul((1.0, 0.0, 0.0, 1.0, 0.0, -st.leading), st.text_line_matrix)
        st.text_matrix = nm
        st.text_line_matrix = nm
        decoded = decode_text(text_bytes, st.font_name, self.fonts)
        x, y = st.origin()
        if not self._skip_artifact():
            if self._total:
                self._append("\n")
            self._append(decoded)
        info = self.fonts.get(st.font_name) if st.font_name else None
        width = calculate_text_width_from_codes(text_bytes, decoded, st.font_size, info)
        self.last_x = x + width
        self.last_y = y
        tx = width * st.horizontal_scale / 100.0
        st.text_matrix = _mul((1.0, 0.0, 0.0, 1.0, tx, 0.0), st.text_matrix)

    # -- xobjects ----------------------------------------------------------

    def _paint_xobject(self, name: str, resources: dict | None, depth: int) -> None:
        """Do (extraction.rs:1313-1392 + extract_images.rs reference capture)."""
        if self.reader is None or resources is None:
            return
        reader = self.reader
        xobjects = resources.get("XObject")
        if isinstance(xobjects, Ref):
            xobjects = reader.resolve(xobjects)
        if not isinstance(xobjects, dict):
            return
        target = xobjects.get(name)
        obj = reader.resolve(target) if isinstance(target, Ref) else target
        if not isinstance(obj, Stream):
            return
        subtype = str(obj.dict.get("Subtype", ""))
        if subtype == "Image":
            self._emit_image(name)
            return
        if subtype != "Form" or depth >= MAX_XOBJECT_DEPTH:
            return
        # Form XObject: implicit q/Q, /Matrix onto CTM, own /Resources fonts
        try:
            data = obj.decode(resolve=reader.resolve)
            ops = parse_content(data)
        except Exception:
            return
        xres = obj.dict.get("Resources")
        if isinstance(xres, Ref):
            xres = reader.resolve(xres)
        xres = xres if isinstance(xres, dict) else None
        st = self.state
        saved_ctm = st.ctm
        saved_stack_len = len(st.saved)
        saved_fonts = self.fonts
        matrix = obj.dict.get("Matrix")
        if isinstance(matrix, list) and len(matrix) == 6:
            try:
                m = tuple(float(v) for v in matrix)
                st.ctm = _mul(m, st.ctm)
            except (TypeError, ValueError):
                pass
        if xres is not None:
            merged = dict(self.fonts)
            merged.update(extract_page_fonts(xres, reader))
            self.fonts = merged
        saved_in_text = self.in_text
        self.in_text = False
        self.run(ops, xres if xres is not None else resources, depth + 1)
        self.in_text = saved_in_text
        st.ctm = saved_ctm
        del st.saved[saved_stack_len:]
        self.fonts = saved_fonts

    # -- main loop -----------------------------------------------------------

    def run(self, ops: list[tuple], resources: dict | None, depth: int = 0) -> None:
        st = self.state
        for op in ops:
            tag = op[0]
            if tag == "BT":
                self.in_text = True
                st.text_matrix = IDENTITY
                st.text_line_matrix = IDENTITY
            elif tag == "ET":
                self.in_text = False
            elif tag == "Tm":
                m = (op[1], op[2], op[3], op[4], op[5], op[6])
                st.text_matrix = m
                st.text_line_matrix = m
            elif tag == "Td":
                nm = _mul((1.0, 0.0, 0.0, 1.0, op[1], op[2]), st.text_line_matrix)
                st.text_matrix = nm
                st.text_line_matrix = nm
            elif tag == "T*":
                nm = _mul((1.0, 0.0, 0.0, 1.0, 0.0, -st.leading), st.text_line_matrix)
                st.text_matrix = nm
                st.text_line_matrix = nm
            elif tag == "Tj":
                if self.in_text:
                    self._show_text(op[1])
            elif tag == "TJ":
                if self.in_text:
                    self._show_text_array(op[1])
            elif tag == "'":
                if self.in_text:
                    self._next_line_show(op[1])
            elif tag == '"':
                if self.in_text:
                    # aw Tw, ac Tc, then ' (ISO §9.4.3; extraction.rs:1091)
                    st.word_space = op[1]
                    st.char_space = op[2]
                    self._next_line_show(op[3])
            elif tag == "Tf":
                st.font_name = op[1]
                st.font_size = op[2]
            elif tag == "TL":
                st.leading = op[1]
            elif tag == "Tc":
                st.char_space = op[1]
            elif tag == "Tw":
                st.word_space = op[1]
            elif tag == "Tz":
                st.horizontal_scale = op[1]
            elif tag == "Ts":
                st.text_rise = op[1]
            elif tag == "Tr":
                st.render_mode = op[1]
            elif tag == "cm":
                st.ctm = _mul((op[1], op[2], op[3], op[4], op[5], op[6]), st.ctm)
            elif tag == "q":
                st.saved.append(st.ctm)
            elif tag == "Q":
                if st.saved:
                    st.ctm = st.saved.pop()
            elif tag == "BMC":
                parent_artifact = bool(st.mc_stack) and st.mc_stack[-1][1]
                st.mc_stack.append((op[1], op[1] == "Artifact" or parent_artifact))
            elif tag == "BDC":
                parent_artifact = bool(st.mc_stack) and st.mc_stack[-1][1]
                st.mc_stack.append((op[1], op[1] == "Artifact" or parent_artifact))
            elif tag == "EMC":
                if st.mc_stack:
                    st.mc_stack.pop()
            elif tag == "Do":
                self._paint_xobject(op[1], resources, depth)
            elif tag == "BI":
                self._emit_image(f"inline:{self.page_index}:{self._inline_idx}")
                self._inline_idx += 1
            # all other operators have no extraction effect (extraction.rs _=>{})

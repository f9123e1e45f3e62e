"""Plain-text extraction: simplified no-position API.

Behavioral parity target: the reference's text/plaintext module
(types.rs PlainTextConfig/LineBreakMode/PlainTextResult, extractor.rs
PlainTextExtractor). This is a deliberately SIMPLER interpreter than the
span-contract engine in kernel/textstate.py — it tracks only the text
matrix, leading, and font, and transcribes the reference's quirks:

- Only BT/ET/Tm/Td/T*/Tj/TJ/Tf/TL are interpreted; TD, ', ", Tz, Tc/Tw,
  cm/q/Q and everything else fall into the catch-all and are IGNORED
  (extractor.rs:332-334 `_ => {}` — including the ' and " show forms).
- Spacing: newline when |Δy| between show origins exceeds
  ``newline_threshold`` (absolute units), else space when
  Δx > space_threshold × font_size (extractor.rs:259-267). TJ emits the
  inter-operator spacing ONCE at array start, then one space per wide
  forward kern (> tj_space_threshold × font_size) unless the output
  already ends with a space (issue #272; extractor.rs:276-316).
- Line-break post-processing (extractor.rs:460-534): Auto joins wrapped
  lines unless the line ends with ./!/?/: or the next line is blank;
  PreserveAll is the identity; Normalize joins hyphenated line ends
  ("docu-\\nment" → "document") directly (the hyphen-joined next line is
  appended raw, leading whitespace and all).
- TextState defaults: identity matrices, leading 0, font_size 0 (so no
  space can fire before the first Tf), font None (extractor.rs:30-41).
- Failed content-stream parses are skipped, not fatal (extractor.rs:206).
"""

from __future__ import annotations

AUTO = "auto"
PRESERVE_ALL = "preserve_all"
NORMALIZE = "normalize"


class PlainTextConfig:
    """types.rs:23-96 defaults + the three preset constructors."""

    __slots__ = (
        "space_threshold",
        "tj_space_threshold",
        "newline_threshold",
        "preserve_layout",
        "line_break_mode",
    )

    def __init__(
        self,
        space_threshold=0.3,
        tj_space_threshold=0.2,
        newline_threshold=10.0,
        preserve_layout=False,
        line_break_mode=AUTO,
    ):
        self.space_threshold = space_threshold
        self.tj_space_threshold = tj_space_threshold
        self.newline_threshold = newline_threshold
        self.preserve_layout = preserve_layout
        self.line_break_mode = line_break_mode

    @classmethod
    def dense(cls) -> "PlainTextConfig":
        """types.rs:126-134 — tightly-spaced text."""
        return cls(0.1, 0.1, 8.0, False, AUTO)

    @classmethod
    def loose(cls) -> "PlainTextConfig":
        """types.rs:149-157 — wide spacing."""
        return cls(0.4, 0.25, 15.0, False, AUTO)

    @classmethod
    def preserve_layout_config(cls) -> "PlainTextConfig":
        """types.rs:172-180 — tabular / code layouts."""
        return cls(0.3, 0.2, 10.0, True, PRESERVE_ALL)


class PlainTextResult:
    """types.rs:252-330: text + derived line/char counts."""

    __slots__ = ("text", "line_count", "char_count")

    def __init__(self, text: str, line_count: int, char_count: int):
        self.text = text
        self.line_count = line_count
        self.char_count = char_count

    @classmethod
    def new(cls, text: str) -> "PlainTextResult":
        # Rust str::lines(): a trailing \n does not create an extra line
        return cls(text, len(text.splitlines()), len(text))

    @classmethod
    def empty(cls) -> "PlainTextResult":
        return cls("", 0, 0)

    def is_empty(self) -> bool:
        return self.text == ""


def _mul(m1, m2):
    """extractor.rs:564-585 multiply_matrix (row-vector convention)."""
    return (
        m1[0] * m2[0] + m1[1] * m2[2],
        m1[0] * m2[1] + m1[1] * m2[3],
        m1[2] * m2[0] + m1[3] * m2[2],
        m1[2] * m2[1] + m1[3] * m2[3],
        m1[4] * m2[0] + m1[5] * m2[2] + m2[4],
        m1[4] * m2[1] + m1[5] * m2[3] + m2[5],
    )


_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


class PlainTextExtractor:
    """extractor.rs PlainTextExtractor. Fonts are cached across pages on
    the instance (extractor.rs:381-383), so reuse one extractor for a
    multi-page document."""

    def __init__(self, config: PlainTextConfig | None = None):
        self.config = config if config is not None else PlainTextConfig()
        self._font_cache: dict = {}

    def extract(self, data: bytes, page_index: int = 0) -> PlainTextResult:
        """One page → PlainTextResult (extractor.rs:182-352)."""
        from .content import parse_content
        from .extract import PdfParseError
        from .fonts import decode_text, extract_page_fonts
        from .pages import flatten_page_tree, page_content
        from .reader import PdfReader

        reader = PdfReader(data)
        pages = flatten_page_tree(reader)
        if page_index >= len(pages):
            raise PdfParseError(f"page {page_index} out of range")
        page = pages[page_index]

        # persistent font cache: new names merge, existing entries stay
        try:
            for name, info in extract_page_fonts(page.resources, reader).items():
                self._font_cache.setdefault(name, info)
        except Exception:
            pass

        try:
            ops = parse_content(page_content(reader, page))
        except Exception:
            ops = []  # failed parse: skip the stream (extractor.rs:206)

        cfg = self.config
        out: list[str] = []
        out_len = 0
        ends_space = False
        tm = _IDENTITY
        tlm = _IDENTITY
        leading = 0.0
        font_size = 0.0
        font_name = None
        in_text = False
        last_x = 0.0
        last_y = 0.0

        def decoded(b: bytes) -> str:
            return decode_text(b, font_name, self._font_cache)

        for op in ops:
            name = op[0]
            if name == "BT":
                in_text = True
                tm = _IDENTITY
                tlm = _IDENTITY
            elif name == "ET":
                in_text = False
            elif name == "Tm":
                tm = tlm = (op[1], op[2], op[3], op[4], op[5], op[6])
            elif name == "Td":
                tm = tlm = _mul((1.0, 0.0, 0.0, 1.0, op[1], op[2]), tlm)
            elif name == "T*":
                tm = tlm = _mul((1.0, 0.0, 0.0, 1.0, 0.0, -leading), tlm)
            elif name == "Tf":
                font_name = op[1]
                font_size = op[2]
            elif name == "TL":
                leading = op[1]
            elif name == "Tj":
                if in_text:
                    x, y = tm[4], tm[5]
                    if out_len:
                        dy = abs(y - last_y)
                        if dy > cfg.newline_threshold:
                            out.append("\n")
                            out_len += 1
                            ends_space = False
                        elif x - last_x > cfg.space_threshold * font_size:
                            out.append(" ")
                            out_len += 1
                            ends_space = True
                    s = decoded(op[1])
                    if s:
                        out.append(s)
                        out_len += len(s)
                        ends_space = s.endswith(" ")
                    last_x = x
                    last_y = y
            elif name == "TJ":
                if in_text:
                    x, y = tm[4], tm[5]
                    if out_len:
                        dy = abs(y - last_y)
                        if dy > cfg.newline_threshold:
                            out.append("\n")
                            out_len += 1
                            ends_space = False
                        elif x - last_x > cfg.space_threshold * font_size:
                            out.append(" ")
                            out_len += 1
                            ends_space = True
                    for item in op[1]:
                        if item[0] == "t":
                            s = decoded(item[1])
                            if s:
                                out.append(s)
                                out_len += len(s)
                                ends_space = s.endswith(" ")
                        else:
                            tx = -item[1] / 1000.0 * font_size
                            if (
                                tx > cfg.tj_space_threshold * font_size
                                and out_len
                                and not ends_space
                            ):
                                out.append(" ")
                                out_len += 1
                                ends_space = True
                            tm = _mul((1.0, 0.0, 0.0, 1.0, tx, 0.0), tm)
                    last_x = tm[4]
                    last_y = y
            # everything else — TD, ', ", Tz, Tc, Tw, cm, q/Q, Do, BI… —
            # is ignored (extractor.rs:332-334)

        return PlainTextResult.new(self.apply_line_break_mode("".join(out)))

    def extract_lines(self, data: bytes, page_index: int = 0) -> list[str]:
        """extractor.rs:367-376."""
        return self.extract(data, page_index).text.splitlines()

    def extract_all(self, data: bytes) -> list[PlainTextResult]:
        """Every page of the document, in page-tree order."""
        from .pages import flatten_page_tree
        from .reader import PdfReader

        n = len(flatten_page_tree(PdfReader(data)))
        return [self.extract(data, i) for i in range(n)]

    # -- line-break post-processing (extractor.rs:460-534) ------------------

    def apply_line_break_mode(self, text: str) -> str:
        mode = self.config.line_break_mode
        if mode == AUTO:
            return self.auto_line_breaks(text)
        if mode == NORMALIZE:
            return self.normalize_line_breaks(text)
        return text  # PreserveAll

    def auto_line_breaks(self, text: str) -> str:
        """extractor.rs:469-502: keep the break after ./!/?/: or before a
        blank line; join (with a space) otherwise."""
        lines = _rust_lines(text)
        result: list[str] = []
        for i, line in enumerate(lines):
            trimmed = line.rstrip()
            if trimmed == "":
                result.append("\n")
                continue
            result.append(line)
            if i < len(lines) - 1:
                next_line = lines[i + 1].lstrip()
                ends_with_punct = trimmed.endswith((".", "!", "?", ":"))
                if ends_with_punct or next_line == "":
                    result.append("\n")
                else:
                    result.append(" ")
        return "".join(result)

    def normalize_line_breaks(self, text: str) -> str:
        """extractor.rs:505-534: join hyphenated line ends; the next line
        is consumed raw by the following iteration."""
        lines = _rust_lines(text)
        result: list[str] = []
        for i, line in enumerate(lines):
            trimmed = line.rstrip()
            if trimmed == "":
                result.append("\n")
                continue
            if trimmed.endswith("-") and i < len(lines) - 1:
                if lines[i + 1].lstrip() != "":
                    result.append(trimmed[:-1])
                    continue
            result.append(line)
            if i < len(lines) - 1:
                result.append("\n")
        return "".join(result)


def _rust_lines(text: str) -> list[str]:
    """Rust str::lines(): split on \\n (stripping a preceding \\r), no
    trailing empty line for a trailing newline."""
    if text == "":
        return []
    parts = [p[:-1] if p.endswith("\r") else p for p in text.split("\n")]
    if parts and parts[-1] == "" and text.endswith("\n"):
        parts.pop()
    return parts

"""Element-typed document partitioning + hybrid chunking.

Re-expresses the reference's typed-element pipeline over this engine's
layout output (paragraph-level TextFragments with positions and font
sizes):

- element classification:  pipeline/partition.rs:438-469 (body font size =
  most frequent fragment size, smaller wins ties because body text is
  typically smaller than headings; title when
  font_size >= body * TITLE_MIN_FONT_RATIO and > body)
- element model:           pipeline/element.rs (Title/Paragraph subset —
  the kinds this engine's span contract carries)
- heading lineage:         pipeline/partition.rs:580-634 assign_heading_paths,
  flattened to single-level (nearest preceding title); a title's own
  heading is itself
- hybrid chunking:         pipeline/hybrid_chunking.rs:205-296 — greedy
  buffer of adjacent inline elements up to max_tokens, structural elements
  (titles) always start their own chunk, oversized paragraphs split (the
  reference splits by sentences; this corpus has no sentence punctuation,
  so the splitter falls back to max_tokens word windows, which is the
  reference's own behavior when a "sentence" exceeds max_tokens)
"""

from __future__ import annotations

TITLE_MIN_FONT_RATIO = 1.3  # partition.rs:61
HEADER_ZONE = 0.05  # partition.rs:62 — top fraction of the page
FOOTER_ZONE = 0.05  # partition.rs:63 — bottom fraction
MAX_HEADER_TEXT_LEN = 100  # partition.rs:943 — longer text is body
PAGE_HEIGHT = 792.0  # US-Letter default (builders' MediaBox)

_BULLETS = ("- ", "• ", "* ", "– ", "— ")


def is_list_item(text: str) -> bool:
    """partition.rs:722-757: bullet prefixes, or '1. '/'2) '/'a. '/'a) '
    (single digit/lowercase letter, or two digits) followed by a space."""
    t = text.lstrip()
    if t.startswith(_BULLETS):
        return True
    if len(t) >= 3:
        c0, c1, c2 = t[0], t[1], t[2]
        if (
            (c0.isascii() and (c0.isdigit() or c0.islower()))
            and c1 in ".)"
            and c2 == " "
        ):
            return True
        if (
            len(t) >= 4
            and c0.isascii()
            and c0.isdigit()
            and c1.isascii()
            and c1.isdigit()
            and t[2] in ".)"
            and t[3] == " "
        ):
            return True
    return False


class Element:
    """Typed document element (pipeline/element.rs subset)."""

    __slots__ = ("kind", "text", "heading", "font_size", "page")

    def __init__(self, kind, text, heading, font_size, page):
        self.kind = kind  # 'title' | 'paragraph'
        self.text = text
        self.heading = heading  # nearest preceding title (self for titles)
        self.font_size = font_size
        self.page = page


def body_font_size(sizes: list[float]) -> float:
    """Most frequent font size; ties broken toward the SMALLER size
    (partition.rs:438-457: body text is typically smaller than headings).
    Returns 0.0 for an empty document."""
    if not sizes:
        return 0.0
    counts: dict[float, int] = {}
    for s in sizes:
        counts[s] = counts.get(s, 0) + 1
    return min(counts, key=lambda s: (-counts[s], s))


def classify_elements(
    paragraph_fragments,
    page_height: float = PAGE_HEIGHT,
    detect_headers_footers: bool = True,
    known_headings=None,
) -> list[Element]:
    """Paragraph-level fragments (layout.py A4 output, reading order) →
    typed elements with single-level heading lineage. Classification order
    mirrors partition.rs: header/footer ZONES claim first (top/bottom 5%
    of the page, text ≤ 100 chars — partition.rs:267-300), then the
    font-ratio title rule, then list-item prefixes (partition.rs:556),
    else paragraph. Headers/footers never update the heading lineage.

    ``known_headings``: optional set of AUTHORITATIVE heading strings
    (outline /Title values from extract_outline — structure/outline.rs
    carries ground truth where font heuristics only guess): a fragment
    whose text equals a known heading is a title regardless of font ratio,
    so outline-bearing PDFs chunk on their real section structure even
    when headings share the body font size."""
    pairs = [
        (p, f)
        for p, f in frags_with_page(paragraph_fragments)
        if f.text.strip()
    ]
    body = body_font_size([f.font_size for _, f in pairs if f.font_size > 0])
    threshold = body * TITLE_MIN_FONT_RATIO
    header_thr = page_height * (1.0 - HEADER_ZONE)
    footer_thr = page_height * FOOTER_ZONE
    out: list[Element] = []
    heading: str | None = None
    for page, f in pairs:
        text = f.text.replace("\n", " ")
        if detect_headers_footers and len(text) <= MAX_HEADER_TEXT_LEN:
            if f.y >= header_thr:
                out.append(Element("header", text, heading, f.font_size, page))
                continue
            if f.y + f.height <= footer_thr:
                out.append(Element("footer", text, heading, f.font_size, page))
                continue
        is_title = (
            body > 0 and f.font_size >= threshold and f.font_size > body
        ) or (known_headings is not None and text in known_headings)
        if is_title:
            heading = text
            out.append(Element("title", text, text, f.font_size, page))
        elif is_list_item(text):
            out.append(Element("list_item", text, heading, f.font_size, page))
        else:
            out.append(Element("paragraph", text, heading, f.font_size, page))
    return out


def frags_with_page(frags):
    """Accept either a flat fragment list (page unknown → 0) or a list of
    (page_index, fragment) pairs."""
    for f in frags:
        if isinstance(f, tuple):
            yield f
        else:
            yield (0, f)


def classify_pages(page_fragments, known_headings=None) -> list[Element]:
    """Per-page paragraph fragments (DocResult.page_fragments) → one
    document-ordered element list; body font is computed over the whole
    document (partition.rs computes it over all unclaimed fragments)."""
    flat = [
        (i, f) for i, page in enumerate(page_fragments) for f in page
    ]
    return classify_elements(flat, known_headings=known_headings)


class Chunk:
    __slots__ = ("kind", "heading", "text", "n_tokens")

    def __init__(self, kind, heading, text, n_tokens):
        self.kind = kind  # 'title' | 'body'
        self.heading = heading
        self.text = text
        self.n_tokens = n_tokens


def _words(text: str) -> list[str]:
    return [w for w in text.split(" ") if w]


def hybrid_chunks(elements: list[Element], max_tokens: int = 64) -> list[Chunk]:
    """hybrid_chunking.rs:205-296 greedy algorithm:

    - adjacent PARAGRAPH elements merge into one chunk while the running
      word count stays <= max_tokens (MergePolicy::AnyInlineContent over
      the kinds this engine emits)
    - a TITLE is structural: it always flushes the buffer and becomes its
      own chunk (its heading context is itself)
    - an oversized paragraph (alone > max_tokens) splits into max_tokens
      word windows, each its own chunk, all carrying the paragraph's
      heading context
    - chunk text joins member elements with a single space (the reference
      joins with newline and callers flatten; this engine's span contract
      is already newline-free at this level)
    """
    chunks: list[Chunk] = []
    buf: list[Element] = []
    buf_tokens = 0
    buf_heading: str | None = None

    def flush():
        nonlocal buf, buf_tokens, buf_heading
        if buf:
            chunks.append(
                Chunk(
                    "body",
                    buf_heading,
                    " ".join(e.text for e in buf),
                    buf_tokens,
                )
            )
            buf = []
            buf_tokens = 0
            buf_heading = None

    for el in elements:
        toks = len(_words(el.text))
        if el.kind == "title":
            flush()
            chunks.append(Chunk("title", el.heading, el.text, toks))
            continue
        if el.kind in ("header", "footer"):
            # non-inline (hybrid_chunking.rs:416 is_inline_element):
            # page furniture never merges — its own chunk, lineage kept
            flush()
            chunks.append(Chunk(el.kind, el.heading, el.text, toks))
            continue
        # paragraph / list_item: inline content (AnyInlineContent policy)
        if buf and buf_tokens + toks <= max_tokens:
            buf.append(el)
            buf_tokens += toks
            continue
        flush()
        if toks > max_tokens:
            ws = _words(el.text)
            for j in range(0, len(ws), max_tokens):
                piece = ws[j : j + max_tokens]
                chunks.append(
                    Chunk("body", el.heading, " ".join(piece), len(piece))
                )
            continue
        buf = [el]
        buf_tokens = toks
        buf_heading = el.heading
    flush()
    return chunks

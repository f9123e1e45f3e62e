"""Element graph, chunkers, and RAG chunk metadata over RichElements.

Behavioral parity targets, transcribed faithfully including their
implementation-specific quirks:

- pipeline/graph.rs      `ElementGraph` — index-based parent/child +
  next/prev; titles are always roots; a non-title's parent is the most
  recent PRECEDING title whose text equals its `parent_heading`.
- pipeline/hybrid_chunking.rs `HybridChunker` — greedy merge of inline
  elements under a token budget; oversized splittables split at
  sentence boundaries; `chunk_with_graph` packs whole sections.
- pipeline/semantic_chunking.rs `SemanticChunker` — element-boundary
  chunker WITH trailing-element overlap. Reference quirks kept: after
  an overlap-carrying flush, the token counter is ASSIGNED (not added),
  so overlap elements ride along uncounted; sentence-buffer chunks
  bypass the overlap mechanism entirely.
- pipeline/chunk_metadata.rs `ChunkMetadata` — char-weighted dominant
  font/size (Rust max_by_key → LAST max on ties), strict-majority
  bold/italic, per-page citation regions, stable content-hash ids.
- pipeline/rag.rs        `RagChunk` — the chunk record RAG consumers
  read; prev/next linked by `link_chunks`.
- pipeline/profile.rs    `ExtractionProfile` — preset extraction +
  partition configs (Standard/Academic/Form/Government/Dense/
  Presentation/Rag).

Language detection: the reference feature-gates `whatlang` (ISO 639-3
codes). This engine's stand-in is its own stopword-hit heuristic (the
same family as q_text_language_id), exposed through the identical
`(code, confidence, reliable) | None` contract; pass
``lang_detector=None`` (default) for the feature-off behavior.
"""

from __future__ import annotations

import hashlib
import json

from .partition import (
    ElementBBox,
    ElementMetadata,
    KIND_CODE_BLOCK,
    KIND_KEY_VALUE,
    KIND_LIST_ITEM,
    KIND_PARAGRAPH,
    KIND_TABLE,
    KIND_TITLE,
    PartitionConfig,
    RichElement,
    union_bbox,
)


def estimate_tokens(text: str) -> int:
    """Word-count token proxy (hybrid_chunking.rs:397-399)."""
    return len(text.split())


# ---------------------------------------------------------------------------
# ElementGraph (graph.rs)
# ---------------------------------------------------------------------------


class ElementGraph:
    """graph.rs ElementGraph: standalone index-based relationship graph."""

    __slots__ = ("parent", "children", "next", "prev", "_is_title")

    def __init__(self, parent, children, next_, prev, is_title):
        self.parent = parent
        self.children = children
        self.next = next_
        self.prev = prev
        self._is_title = is_title

    @classmethod
    def build(cls, elements) -> "ElementGraph":
        """graph.rs:46-111. Titles are always roots; a non-title element
        is the child of the most recent preceding Title whose text equals
        the element's parent_heading (no parent when that title only
        appears later)."""
        n = len(elements)
        parent = [None] * n
        children = [[] for _ in range(n)]
        next_ = [i + 1 if i + 1 < n else None for i in range(n)]
        prev = [i - 1 if i > 0 else None for i in range(n)]
        is_title = [e.kind == KIND_TITLE for e in elements]

        active_title_for_heading: dict[str, int] = {}
        for i, e in enumerate(elements):
            if is_title[i]:
                active_title_for_heading[e.text] = i
                # titles are always roots (graph.rs:84-92)
            else:
                heading_text = e.metadata.parent_heading
                if heading_text is not None:
                    title_idx = active_title_for_heading.get(heading_text)
                    if title_idx is not None:
                        parent[i] = title_idx
                        children[title_idx].append(i)
        return cls(parent, children, next_, prev, is_title)

    def __len__(self) -> int:
        return len(self.parent)

    def is_empty(self) -> bool:
        return len(self.parent) == 0

    def parent_of(self, idx: int):
        return self.parent[idx]

    def children_of(self, idx: int) -> list:
        return self.children[idx]

    def next_of(self, idx: int):
        return self.next[idx]

    def prev_of(self, idx: int):
        return self.prev[idx]

    def elements_in_section(self, title_idx: int) -> list:
        """graph.rs:166-168 — alias of children_of."""
        return list(self.children[title_idx])

    def top_level_sections(self) -> list:
        """graph.rs:171-175 — parentless Title indices."""
        return [
            i
            for i in range(len(self.parent))
            if self._is_title[i] and self.parent[i] is None
        ]


# ---------------------------------------------------------------------------
# Sentence splitters
# ---------------------------------------------------------------------------


def split_into_sentences(text: str) -> list[str]:
    """hybrid_chunking.rs:478-508: '.'/'!'/'?' ONLY when followed by a
    space (which is consumed); bare newlines also split."""
    sentences: list[str] = []
    current: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        current.append(ch)
        if ch in ".!?":
            if i + 1 < n and text[i + 1] == " ":
                i += 1  # skip the space after the delimiter
                s = "".join(current).strip()
                sentences.append(s)
                current = []
        elif ch == "\n":
            s = "".join(current).strip()
            if s:
                sentences.append(s)
            current = []
        i += 1
    remaining = "".join(current).strip()
    if remaining:
        sentences.append(remaining)
    return sentences


def split_sentences_semantic(text: str) -> list[str]:
    """semantic_chunking.rs:266-289 — the SemanticChunker's own simpler
    splitter: every '.'/'!'/'?' ends a sentence (no space lookahead); a
    terminator-less leftover is APPENDED to the last sentence."""
    sentences: list[str] = []
    current: list[str] = []
    for ch in text:
        current.append(ch)
        if ch in ".!?" and "".join(current).strip():
            sentences.append("".join(current).strip())
            current = []
    leftover = "".join(current).strip()
    if leftover:
        if sentences:
            sentences[-1] = sentences[-1] + " " + leftover
        else:
            sentences.append(leftover)
    return sentences


def split_by_sentences(text: str, max_tokens: int) -> list[str]:
    """hybrid_chunking.rs:434-475: greedy sentence packing under
    max_tokens counting +1 token per joining space; an over-long single
    sentence is emitted whole; never returns []."""
    fragments: list[str] = []
    current = ""
    current_tokens = 0
    for sentence in split_into_sentences(text):
        sentence = sentence.strip()
        if not sentence:
            continue
        sentence_tokens = estimate_tokens(sentence)
        if not current:
            current = sentence
            current_tokens = sentence_tokens
        elif current_tokens + 1 + sentence_tokens <= max_tokens:
            current = current + " " + sentence
            current_tokens += 1 + sentence_tokens
        else:
            fragments.append(current)
            current = sentence
            current_tokens = sentence_tokens
    if current:
        fragments.append(current)
    if not fragments:
        fragments.append(text)
    return fragments


# ---------------------------------------------------------------------------
# HybridChunker (hybrid_chunking.rs)
# ---------------------------------------------------------------------------

MERGE_SAME_TYPE_ONLY = "same_type_only"
MERGE_ANY_INLINE = "any_inline_content"


class HybridChunkConfig:
    """hybrid_chunking.rs:51-82. ``overlap_tokens`` is reserved/ignored
    (the reference removed element re-injection to keep chunks
    element-disjoint)."""

    __slots__ = (
        "max_tokens",
        "overlap_tokens",
        "merge_adjacent",
        "propagate_headings",
        "merge_policy",
    )

    def __init__(
        self,
        max_tokens=512,
        overlap_tokens=50,
        merge_adjacent=True,
        propagate_headings=True,
        merge_policy=MERGE_ANY_INLINE,
    ):
        self.max_tokens = max_tokens
        self.overlap_tokens = overlap_tokens
        self.merge_adjacent = merge_adjacent
        self.propagate_headings = propagate_headings
        self.merge_policy = merge_policy


class HybridChunk:
    """hybrid_chunking.rs:86-125."""

    __slots__ = ("elements", "heading_context", "oversized")

    def __init__(self, elements, heading_context=None, oversized=False):
        self.elements = elements
        self.heading_context = heading_context
        self.oversized = oversized

    def text(self) -> str:
        return "\n".join(e.display_text() for e in self.elements)

    def full_text(self) -> str:
        """Heading context prepended for embedding generation."""
        if self.heading_context is not None:
            return f"{self.heading_context}\n\n{self.text()}"
        return self.text()

    def token_estimate(self) -> int:
        return estimate_tokens(self.text())

    def is_oversized(self) -> bool:
        return self.oversized


def _is_inline_element(e: RichElement) -> bool:
    """hybrid_chunking.rs:416-421."""
    return e.kind in (KIND_PARAGRAPH, KIND_LIST_ITEM, KIND_KEY_VALUE)


def _can_merge_elements(a, b, policy) -> bool:
    """hybrid_chunking.rs:403-413."""
    if policy == MERGE_SAME_TYPE_ONLY:
        return (a.kind, b.kind) in (
            (KIND_PARAGRAPH, KIND_PARAGRAPH),
            (KIND_LIST_ITEM, KIND_LIST_ITEM),
        )
    return _is_inline_element(a) and _is_inline_element(b)


def _is_splittable_hybrid(e: RichElement) -> bool:
    """hybrid_chunking.rs:424-426 — paragraphs and list items only."""
    return e.kind in (KIND_PARAGRAPH, KIND_LIST_ITEM)


def _make_text_fragment_element(source: RichElement, text: str) -> RichElement:
    """hybrid_chunking.rs:510-524: a Paragraph carrying ONLY the source's
    page/bbox/parent_heading/heading_path (other metadata reset)."""
    m = source.metadata
    return RichElement(
        KIND_PARAGRAPH,
        text,
        ElementMetadata(
            page=m.page,
            bbox=ElementBBox(m.bbox.x, m.bbox.y, m.bbox.width, m.bbox.height),
            parent_heading=m.parent_heading,
            heading_path=list(m.heading_path),
        ),
    )


class HybridChunker:
    """hybrid_chunking.rs:187-395."""

    def __init__(self, config: HybridChunkConfig | None = None):
        self.config = config if config is not None else HybridChunkConfig()

    def chunk(self, elements) -> list[HybridChunk]:
        if not elements:
            return []
        cfg = self.config
        chunks: list[HybridChunk] = []
        buffer: list[RichElement] = []
        buffer_tokens = 0
        buffer_heading = None

        def flush():
            nonlocal buffer, buffer_tokens, buffer_heading
            chunks.append(HybridChunk(buffer, buffer_heading, False))
            buffer = []
            buffer_tokens = 0
            buffer_heading = None

        for element in elements:
            elem_tokens = estimate_tokens(element.display_text())
            elem_heading = (
                element.metadata.parent_heading if cfg.propagate_headings else None
            )

            can_merge = (
                cfg.merge_adjacent
                and bool(buffer)
                and _can_merge_elements(buffer[-1], element, cfg.merge_policy)
                and buffer_tokens + elem_tokens <= cfg.max_tokens
            )
            if can_merge:
                buffer.append(element.clone())
                buffer_tokens += elem_tokens
                continue

            if buffer and (
                buffer_tokens + elem_tokens > cfg.max_tokens
                or not _can_merge_elements(buffer[-1], element, cfg.merge_policy)
                or not cfg.merge_adjacent
            ):
                flush()

            if elem_tokens > cfg.max_tokens and not buffer:
                if _is_splittable_hybrid(element):
                    for fragment in split_by_sentences(
                        element.display_text(), cfg.max_tokens
                    ):
                        chunks.append(
                            HybridChunk(
                                [_make_text_fragment_element(element, fragment.strip())],
                                elem_heading,
                                False,
                            )
                        )
                else:
                    # table/image/code: atomic oversized chunk
                    chunks.append(HybridChunk([element.clone()], elem_heading, True))
                continue

            if not buffer:
                buffer_heading = elem_heading
            buffer.append(element.clone())
            buffer_tokens += elem_tokens

        if buffer:
            chunks.append(HybridChunk(buffer, buffer_heading, False))
        return chunks

    def chunk_with_graph(self, elements, graph: ElementGraph) -> list[HybridChunk]:
        """hybrid_chunking.rs:299-367: pack whole sections when they fit,
        else delegate to chunk() with the section's heading re-stamped."""
        if not elements:
            return []
        cfg = self.config
        chunks: list[HybridChunk] = []
        top_sections = graph.top_level_sections()
        first_title_idx = top_sections[0] if top_sections else len(elements)

        if first_title_idx > 0:
            chunks.extend(self.chunk(elements[:first_title_idx]))

        for title_idx in top_sections:
            title_el = elements[title_idx]
            title_heading = title_el.metadata.parent_heading
            if title_heading is None:
                title_heading = title_el.text
            section_elements = [title_el.clone()] + [
                elements[ci].clone() for ci in graph.elements_in_section(title_idx)
            ]
            section_tokens = sum(
                estimate_tokens(e.display_text()) for e in section_elements
            )
            if section_tokens <= cfg.max_tokens:
                chunks.append(HybridChunk(section_elements, title_heading, False))
            else:
                sub_chunks = self.chunk(section_elements)
                for sub in sub_chunks:
                    sub.heading_context = title_heading
                chunks.extend(sub_chunks)
        return chunks


# ---------------------------------------------------------------------------
# SemanticChunker (semantic_chunking.rs)
# ---------------------------------------------------------------------------


class SemanticChunkConfig:
    """semantic_chunking.rs:4-38."""

    __slots__ = ("max_tokens", "overlap_tokens", "respect_element_boundaries")

    def __init__(
        self, max_tokens=512, overlap_tokens=50, respect_element_boundaries=True
    ):
        self.max_tokens = max_tokens
        self.overlap_tokens = overlap_tokens
        self.respect_element_boundaries = respect_element_boundaries


class SemanticChunk:
    """semantic_chunking.rs:41-79."""

    __slots__ = ("elements", "oversized")

    def __init__(self, elements, oversized=False):
        self.elements = elements
        self.oversized = oversized

    def text(self) -> str:
        return "\n".join(e.display_text() for e in self.elements)

    def token_estimate(self) -> int:
        return estimate_tokens(self.text())

    def page_numbers(self) -> list[int]:
        return sorted({e.page() for e in self.elements})

    def is_oversized(self) -> bool:
        return self.oversized


def _is_splittable_semantic(e: RichElement) -> bool:
    """semantic_chunking.rs:248-253 — includes code blocks + key-values
    (wider than the hybrid chunker's set)."""
    return e.kind in (KIND_PARAGRAPH, KIND_LIST_ITEM, KIND_CODE_BLOCK, KIND_KEY_VALUE)


class SemanticChunker:
    """semantic_chunking.rs:82-244, quirks preserved (module docstring)."""

    def __init__(self, config: SemanticChunkConfig | None = None):
        self.config = config if config is not None else SemanticChunkConfig()

    def chunk(self, elements) -> list[SemanticChunk]:
        if not elements:
            return []
        cfg = self.config
        chunks: list[SemanticChunk] = []
        current_elements: list[RichElement] = []
        current_tokens = 0

        def flush(oversized: bool):
            # semantic_chunking.rs:210-244 flush_chunk — the overlap walk
            # collects trailing elements until the NEXT one would exceed
            # overlap_tokens (always keeping at least one).
            nonlocal current_elements, current_tokens
            flushed = current_elements
            chunks.append(SemanticChunk(flushed, oversized))
            if cfg.overlap_tokens > 0:
                overlap_tokens = 0
                overlap_elements: list[RichElement] = []
                for elem in reversed(flushed):
                    t = estimate_tokens(elem.display_text())
                    if overlap_tokens + t > cfg.overlap_tokens and overlap_elements:
                        break
                    overlap_elements.append(elem)
                    overlap_tokens += t
                overlap_elements.reverse()
                current_elements = overlap_elements
                current_tokens = overlap_tokens
            else:
                current_elements = []
                current_tokens = 0

        for element in elements:
            elem_tokens = estimate_tokens(element.display_text())

            if not _is_splittable_semantic(element):
                # non-splittable (table/title/header/footer/image)
                if (
                    current_tokens > 0
                    and current_tokens + elem_tokens > cfg.max_tokens
                    and cfg.respect_element_boundaries
                ):
                    flush(False)
                if elem_tokens > cfg.max_tokens and not current_elements:
                    chunks.append(SemanticChunk([element.clone()], True))
                    continue
                current_elements.append(element.clone())
                current_tokens += elem_tokens
                continue

            if current_tokens + elem_tokens <= cfg.max_tokens:
                current_elements.append(element.clone())
                current_tokens += elem_tokens
            elif elem_tokens <= cfg.max_tokens:
                if current_elements:
                    flush(False)
                # reference quirk: the overlap elements flush left behind
                # stay in the chunk, but the counter is ASSIGNED
                current_elements.append(element.clone())
                current_tokens = elem_tokens
            else:
                # element exceeds max_tokens — split by sentences
                if current_elements:
                    flush(False)
                sentences = split_sentences_semantic(element.text)
                meta = element.metadata
                sentence_buf = ""
                buf_tokens = 0
                for sentence in sentences:
                    s_tokens = estimate_tokens(sentence)
                    if buf_tokens + s_tokens > cfg.max_tokens and sentence_buf:
                        # full buffers bypass overlap entirely
                        chunks.append(
                            SemanticChunk(
                                [RichElement(KIND_PARAGRAPH, sentence_buf, meta.clone())],
                                False,
                            )
                        )
                        sentence_buf = ""
                        buf_tokens = 0
                    if sentence_buf:
                        sentence_buf += " "
                    sentence_buf += sentence
                    buf_tokens += s_tokens
                if sentence_buf:
                    current_elements.append(
                        RichElement(KIND_PARAGRAPH, sentence_buf, meta.clone())
                    )
                    current_tokens = buf_tokens

        if current_elements:
            chunks.append(SemanticChunk(current_elements, False))
        return chunks


# ---------------------------------------------------------------------------
# ChunkMetadata (chunk_metadata.rs)
# ---------------------------------------------------------------------------


class DocumentSource:
    """chunk_metadata.rs:95-123."""

    __slots__ = (
        "title", "author", "creation_date", "filename", "doc_hash", "total_pages",
    )

    def __init__(
        self, title=None, author=None, creation_date=None, filename=None,
        doc_hash=None, total_pages=None,
    ):
        self.title = title
        self.author = author
        self.creation_date = creation_date
        self.filename = filename
        self.doc_hash = doc_hash
        self.total_pages = total_pages

    @classmethod
    def with_file(cls, filename=None, doc_hash=None) -> "DocumentSource":
        return cls(filename=filename, doc_hash=doc_hash)


class PageRegion:
    """chunk_metadata.rs:131-136 — per-page union bbox citation anchor."""

    __slots__ = ("page", "bbox")

    def __init__(self, page, bbox):
        self.page = page
        self.bbox = bbox


class Aggregates:
    """chunk_metadata.rs:17-74: char-weighted dominant font/size (LAST
    max on ties, as Rust max_by_key), strict bold/italic majority,
    min confidence (0.0 for an element-less chunk)."""

    __slots__ = (
        "dominant_font", "dominant_font_size", "is_bold", "is_italic",
        "min_confidence",
    )

    def __init__(self, elements):
        font_weight: list[list] = []  # [name, chars]
        size_weight: list[list] = []  # [size, chars]
        bold_chars = 0
        italic_chars = 0
        total_chars = 0
        min_conf = 1.0
        for e in elements:
            w = len(e.text)
            total_chars += w
            meta = e.metadata
            if meta.font_name is not None:
                for slot in font_weight:
                    if slot[0] == meta.font_name:
                        slot[1] += w
                        break
                else:
                    font_weight.append([meta.font_name, w])
            if meta.font_size is not None:
                for slot in size_weight:
                    if abs(slot[0] - meta.font_size) < 0.1:
                        slot[1] += w
                        break
                else:
                    size_weight.append([meta.font_size, w])
            if meta.is_bold:
                bold_chars += w
            if meta.is_italic:
                italic_chars += w
            min_conf = min(min_conf, meta.confidence)

        self.dominant_font = _last_max(font_weight)
        self.dominant_font_size = _last_max(size_weight)
        self.is_bold = total_chars > 0 and bold_chars * 2 > total_chars
        self.is_italic = total_chars > 0 and italic_chars * 2 > total_chars
        self.min_confidence = 0.0 if not elements else min_conf


def _last_max(weighted: list) -> object:
    """Rust Iterator::max_by_key returns the LAST maximal element."""
    best = None
    best_w = None
    for value, w in weighted:
        if best_w is None or w >= best_w:
            best, best_w = value, w
    return best


class ContentTypeFlags:
    """chunk_metadata.rs:80-89."""

    __slots__ = ("has_table", "has_list", "has_code", "heading_only")

    def __init__(self, has_table=False, has_list=False, has_code=False,
                 heading_only=False):
        self.has_table = has_table
        self.has_list = has_list
        self.has_code = has_code
        self.heading_only = heading_only


def content_type_flags(elements) -> ContentTypeFlags:
    """chunk_metadata.rs:373-389."""
    flags = ContentTypeFlags()
    all_titles = bool(elements)
    for e in elements:
        if e.kind == KIND_TABLE:
            flags.has_table = True
        elif e.kind == KIND_LIST_ITEM:
            flags.has_list = True
        elif e.kind == KIND_CODE_BLOCK:
            flags.has_code = True
        if e.kind != KIND_TITLE:
            all_titles = False
    flags.heading_only = all_titles
    return flags


def char_count(text: str) -> int:
    return len(text)


def word_count(text: str) -> int:
    return len(text.split())


def sentence_count(text: str) -> int:
    """chunk_metadata.rs:399-404 — uses the hybrid splitter."""
    if not text.strip():
        return 0
    return len(split_into_sentences(text))


def content_chunk_id(doc_hash, index: int, full_text: str) -> str:
    """chunk_metadata.rs:357-371: '<doc_id>:<index>', doc_id = supplied
    hash or the first 8 bytes of SHA-256(full_text) in hex."""
    if doc_hash is not None:
        doc_id = doc_hash
    else:
        doc_id = hashlib.sha256(full_text.encode("utf-8")).hexdigest()[:16]
    return f"{doc_id}:{index}"


def _table_dims(elements):
    """chunk_metadata.rs:264-277: dims of the largest table by row count
    (LAST max on ties), cols = widest row."""
    best_rows = None
    best_len = None
    for e in elements:
        if e.kind == KIND_TABLE:
            n = len(e.rows or [])
            if best_len is None or n >= best_len:
                best_rows, best_len = e.rows or [], n
    if best_rows is None:
        return (None, None)
    cols = max((len(r) for r in best_rows), default=0)
    return (len(best_rows), cols)


def _page_anchor(elements):
    """chunk_metadata.rs:291-311: per-page union bboxes, first-seen
    grouping then sorted ascending; (None, []) for no elements."""
    by_page: list[list] = []  # [page, bbox]
    for e in elements:
        page = e.metadata.page
        bbox = e.metadata.bbox
        for slot in by_page:
            if slot[0] == page:
                slot[1] = union_bbox(slot[1], bbox)
                break
        else:
            by_page.append([page, ElementBBox(bbox.x, bbox.y, bbox.width, bbox.height)])
    if not by_page:
        return (None, [])
    by_page.sort(key=lambda s: s[0])
    span = (by_page[0][0], by_page[-1][0])
    regions = [PageRegion(p, b) for p, b in by_page]
    return (span, regions)


# stopword-hit language detector (same family as q_text_language_id),
# ISO 639-3 codes matching the reference's whatlang contract
_LANG_STOPWORDS_ISO = {
    "eng": ("the", "of", "and", "to", "in"),
    "deu": ("der", "die", "und", "das", "ist"),
    "spa": ("el", "la", "de", "los", "que"),
    "fra": ("le", "la", "et", "les", "des"),
    "ita": ("il", "di", "che", "per", "con"),
}


def detect_language_full(text: str):
    """Stand-in for chunk_metadata.rs detect_language_full (whatlang):
    stopword-hit argmax → (ISO-639-3 code, confidence, reliable) or None
    for empty/low-signal text. Confidence = best-language share of all
    stopword hits; reliable when >= 3 hits and a strict argmax."""
    words = text.lower().split()
    if not words:
        return None
    scores = {
        lang: sum(1 for w in words if w in sw)
        for lang, sw in _LANG_STOPWORDS_ISO.items()
    }
    total = sum(scores.values())
    if total == 0:
        return None
    best = max(sorted(scores), key=lambda la: scores[la])
    ties = [la for la, s in scores.items() if s == scores[best]]
    confidence = min(scores[best] / total, 1.0)
    reliable = scores[best] >= 3 and len(ties) == 1
    return (best, confidence, reliable)


class ChunkMetadata:
    """chunk_metadata.rs:142-259."""

    __slots__ = (
        "heading_path", "dominant_font", "dominant_font_size", "is_bold",
        "is_italic", "min_confidence", "content_types", "char_count",
        "word_count", "sentence_count", "language", "language_confidence",
        "language_reliable", "chunk_id", "prev_chunk_id", "next_chunk_id",
        "source", "page_span", "page_regions", "table_rows", "table_cols",
        "extra",
    )

    def __init__(self):
        self.heading_path = []
        self.dominant_font = None
        self.dominant_font_size = None
        self.is_bold = False
        self.is_italic = False
        self.min_confidence = 0.0
        self.content_types = ContentTypeFlags()
        self.char_count = 0
        self.word_count = 0
        self.sentence_count = 0
        self.language = None
        self.language_confidence = None
        self.language_reliable = None
        self.chunk_id = ""
        self.prev_chunk_id = None
        self.next_chunk_id = None
        self.source = None
        self.page_span = None
        self.page_regions = []
        self.table_rows = None
        self.table_cols = None
        self.extra = {}

    @classmethod
    def from_elements(
        cls, elements, text: str, full_text: str, chunk_index: int,
        doc_hash=None, lang_detector=None,
    ) -> "ChunkMetadata":
        """chunk_metadata.rs:208-259. ``lang_detector`` mirrors the
        reference's language-detection feature gate: None = feature off
        (all three language fields stay None); pass
        ``detect_language_full`` to enable the stand-in detector."""
        m = cls()
        agg = Aggregates(elements)
        m.heading_path = (
            list(elements[0].metadata.heading_path) if elements else []
        )
        m.dominant_font = agg.dominant_font
        m.dominant_font_size = agg.dominant_font_size
        m.is_bold = agg.is_bold
        m.is_italic = agg.is_italic
        m.min_confidence = agg.min_confidence
        m.content_types = content_type_flags(elements)
        m.char_count = char_count(text)
        m.word_count = word_count(text)
        m.sentence_count = sentence_count(text)
        if lang_detector is not None:
            detected = lang_detector(text)
            if detected is not None:
                m.language, m.language_confidence, m.language_reliable = detected
        m.chunk_id = content_chunk_id(doc_hash, chunk_index, full_text)
        m.page_span, m.page_regions = _page_anchor(elements)
        m.table_rows, m.table_cols = _table_dims(elements)
        return m


def link_chunks(chunks) -> None:
    """chunk_metadata.rs:314-324: prev/next ids from neighbours."""
    ids = [c.metadata.chunk_id for c in chunks]
    for i, c in enumerate(chunks):
        c.metadata.prev_chunk_id = ids[i - 1] if i > 0 else None
        c.metadata.next_chunk_id = ids[i + 1] if i + 1 < len(ids) else None


# ---------------------------------------------------------------------------
# RagChunk (rag.rs)
# ---------------------------------------------------------------------------


def collect_pages(elements) -> list[int]:
    """rag.rs:136-153 — unique pages, sorted (fast path preserved as a
    semantic no-op: same output)."""
    if not elements:
        return []
    first = elements[0].page()
    if all(e.page() == first for e in elements):
        return [first]
    seen = set()
    pages = []
    for e in elements:
        p = e.page()
        if p not in seen:
            seen.add(p)
            pages.append(p)
    pages.sort()
    return pages


class RagChunk:
    """rag.rs:48-134."""

    __slots__ = (
        "chunk_index", "text", "full_text", "page_numbers", "bounding_boxes",
        "element_types", "heading_context", "token_estimate", "is_oversized",
        "metadata",
    )

    def __init__(self, chunk_index, text, full_text, page_numbers,
                 bounding_boxes, element_types, heading_context,
                 token_estimate, is_oversized, metadata):
        self.chunk_index = chunk_index
        self.text = text
        self.full_text = full_text
        self.page_numbers = page_numbers
        self.bounding_boxes = bounding_boxes
        self.element_types = element_types
        self.heading_context = heading_context
        self.token_estimate = token_estimate
        self.is_oversized = is_oversized
        self.metadata = metadata

    @classmethod
    def from_hybrid_chunk(cls, chunk_index: int, chunk: HybridChunk,
                          lang_detector=None) -> "RagChunk":
        return cls._from_hybrid_chunk_inner(chunk_index, chunk, None, lang_detector)

    @classmethod
    def from_hybrid_chunk_with_source(
        cls, chunk_index: int, chunk: HybridChunk, source: DocumentSource,
        lang_detector=None,
    ) -> "RagChunk":
        c = cls._from_hybrid_chunk_inner(chunk_index, chunk, source, lang_detector)
        c.metadata.source = source
        return c

    @classmethod
    def _from_hybrid_chunk_inner(cls, chunk_index, chunk, source, lang_detector):
        """rag.rs:97-126."""
        elements = chunk.elements
        text = chunk.text()
        full_text = chunk.full_text()
        doc_hash = source.doc_hash if source is not None else None
        metadata = ChunkMetadata.from_elements(
            elements, text, full_text, chunk_index, doc_hash, lang_detector
        )
        return cls(
            chunk_index=chunk_index,
            text=text,
            full_text=full_text,
            page_numbers=collect_pages(elements),
            bounding_boxes=[e.bbox() for e in elements],
            element_types=[e.type_name() for e in elements],
            heading_context=chunk.heading_context,
            token_estimate=chunk.token_estimate(),
            is_oversized=chunk.is_oversized(),
            metadata=metadata,
        )

    def to_dict(self) -> dict:
        """rag.rs to_json analogue — a JSON-ready dict."""
        m = self.metadata
        return {
            "chunk_index": self.chunk_index,
            "text": self.text,
            "full_text": self.full_text,
            "page_numbers": self.page_numbers,
            "bounding_boxes": [
                [b.x, b.y, b.width, b.height] for b in self.bounding_boxes
            ],
            "element_types": self.element_types,
            "heading_context": self.heading_context,
            "token_estimate": self.token_estimate,
            "is_oversized": self.is_oversized,
            "metadata": {
                "heading_path": m.heading_path,
                "dominant_font": m.dominant_font,
                "dominant_font_size": m.dominant_font_size,
                "is_bold": m.is_bold,
                "is_italic": m.is_italic,
                "min_confidence": m.min_confidence,
                "content_types": {
                    "has_table": m.content_types.has_table,
                    "has_list": m.content_types.has_list,
                    "has_code": m.content_types.has_code,
                    "heading_only": m.content_types.heading_only,
                },
                "char_count": m.char_count,
                "word_count": m.word_count,
                "sentence_count": m.sentence_count,
                "language": m.language,
                "language_confidence": m.language_confidence,
                "language_reliable": m.language_reliable,
                "chunk_id": m.chunk_id,
                "prev_chunk_id": m.prev_chunk_id,
                "next_chunk_id": m.next_chunk_id,
                "page_span": list(m.page_span) if m.page_span else None,
                "table_rows": m.table_rows,
                "table_cols": m.table_cols,
            },
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)


def rag_chunks_from_elements(
    elements, config: HybridChunkConfig | None = None,
    source: DocumentSource | None = None, lang_detector=None,
    use_graph: bool = False,
) -> list[RagChunk]:
    """Doc-level assembly (parser/document.rs rag_chunks_with_pipeline):
    chunk the elements, build linked RagChunks."""
    chunker = HybridChunker(config)
    if use_graph:
        hybrid = chunker.chunk_with_graph(elements, ElementGraph.build(elements))
    else:
        hybrid = chunker.chunk(elements)
    out = []
    for i, hc in enumerate(hybrid):
        if source is not None:
            out.append(
                RagChunk.from_hybrid_chunk_with_source(i, hc, source, lang_detector)
            )
        else:
            out.append(RagChunk.from_hybrid_chunk(i, hc, lang_detector))
    link_chunks(out)
    return out


def rag_chunks_pdf_bytes(
    data: bytes, config: HybridChunkConfig | None = None,
    partition_config: PartitionConfig | None = None,
    source: DocumentSource | None = None, lang_detector=None,
    use_graph: bool = False,
) -> list[RagChunk]:
    """PdfDocument::rag_chunks_with_source_and_config analogue: raw PDF
    bytes → partition → linked RagChunks."""
    from .partition import partition_pdf_bytes

    elements = partition_pdf_bytes(data, partition_config)
    return rag_chunks_from_elements(
        elements, config, source, lang_detector, use_graph
    )


# ---------------------------------------------------------------------------
# ExtractionProfile (profile.rs)
# ---------------------------------------------------------------------------


class ProfileConfig:
    """profile.rs:46-51: combined extraction + partition settings.
    ``extraction`` holds ExtractionOptions keyword overrides so callers
    compose them into kernel ExtractionOptions without a hard import."""

    __slots__ = ("extraction", "partition")

    def __init__(self, extraction: dict, partition: PartitionConfig):
        self.extraction = extraction
        self.partition = partition


# profile.rs:53-161 — each profile's tuned settings
_PROFILES = {
    "standard": (
        {"space_threshold": 0.3, "detect_columns": False},
        dict(title_min_font_ratio=1.3, header_zone=0.05, footer_zone=0.05),
    ),
    "academic": (
        {"space_threshold": 0.25, "detect_columns": True},
        dict(title_min_font_ratio=1.4, header_zone=0.08, footer_zone=0.08),
    ),
    "form": (
        {"space_threshold": 0.3, "detect_columns": False},
        dict(title_min_font_ratio=1.5, header_zone=0.03, footer_zone=0.03),
    ),
    "government": (
        {"space_threshold": 0.35, "detect_columns": False},
        dict(title_min_font_ratio=1.3, header_zone=0.06, footer_zone=0.06),
    ),
    "dense": (
        {"space_threshold": 0.2, "detect_columns": False},
        dict(title_min_font_ratio=1.3, header_zone=0.05, footer_zone=0.05),
    ),
    "presentation": (
        {"space_threshold": 0.4, "detect_columns": False},
        dict(
            title_min_font_ratio=1.2,
            header_zone=0.10,
            footer_zone=0.10,
            # slide shape grids misfire the spatial detector (issue #329)
            detect_spatial_tables=False,
        ),
    ),
    "rag": (
        {"space_threshold": 0.3, "detect_columns": False},
        dict(
            title_min_font_ratio=1.3,
            header_zone=0.05,
            footer_zone=0.05,
            reading_order="xycut",
            xycut_min_gap=20.0,
            min_table_confidence=0.65,
        ),
    ),
}


def extraction_profile(name: str = "standard") -> ProfileConfig:
    """profile.rs ExtractionProfile::config() for the named profile
    ('standard' | 'academic' | 'form' | 'government' | 'dense' |
    'presentation' | 'rag')."""
    extraction, partition_kwargs = _PROFILES[name.lower()]
    return ProfileConfig(dict(extraction), PartitionConfig(**partition_kwargs))

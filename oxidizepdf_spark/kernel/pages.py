"""Page tree flattening and content-stream assembly.

Reimplements (in-UDF, per document):

- page-tree DFS flatten w/ visited-set + inherited attributes
  (Resources/MediaBox/CropBox/Rotate):
  oxidize-pdf-core/src/parser/page_tree.rs:199; document.rs:486-522
- /Contents assembly (single ref or array, decoded, joined in order):
  page_tree.rs:834; document.rs:1038 — streams are concatenated with a
  space separator per the spec's "treat as one stream" rule
"""

from __future__ import annotations

from .objects import Ref, Stream
from .reader import PdfReader

INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")
MAX_TREE_DEPTH = 64


class Page:
    __slots__ = ("dict", "resources", "media_box")

    def __init__(self, d: dict, resources: dict | None, media_box):
        self.dict = d
        self.resources = resources or {}
        self.media_box = media_box


def flatten_page_tree(reader: PdfReader) -> list[Page]:
    """DFS of /Pages → flat page list in tree order (page_tree.rs:199).

    Tree order drives the output span ``offset`` sequence across pages.
    Inherited attributes are resolved on the way down (document.rs:486-522).
    """
    catalog = reader.catalog()
    pages_obj = reader.resolve(catalog.get("Pages"))
    result: list[Page] = []
    visited: set = set()

    def walk(node, inherited: dict, depth: int):
        if depth > MAX_TREE_DEPTH or not isinstance(node, dict):
            return
        node_type = str(node.get("Type", ""))
        inh = dict(inherited)
        for key in INHERITABLE:
            if key in node:
                inh[key] = node[key]
        if node_type == "Page" or ("Kids" not in node and "Contents" in node):
            d = dict(node)
            for key in INHERITABLE:
                if key not in d and key in inh:
                    d[key] = inh[key]
            resources = reader.resolve(d.get("Resources"))
            media_box = reader.resolve(d.get("MediaBox"))
            result.append(
                Page(d, resources if isinstance(resources, dict) else {}, media_box)
            )
            return
        kids = reader.resolve(node.get("Kids"))
        if not isinstance(kids, list):
            return
        for kid in kids:
            marker = kid if isinstance(kid, Ref) else id(kid)
            if marker in visited:
                continue  # cycle guard
            visited.add(marker)
            walk(reader.resolve(kid), inh, depth + 1)

    walk(pages_obj, {}, 0)
    return result


def page_content(reader: PdfReader, page: Page) -> bytes:
    """Decode and join the page's /Contents streams (page_tree.rs:834).

    A single content stream may be split across several stream objects;
    the spec requires treating the concatenation (with whitespace between)
    as one stream.
    """
    contents = page.dict.get("Contents")
    if contents is None:
        return b""
    contents = reader.resolve(contents)
    streams: list[bytes] = []
    if isinstance(contents, Stream):
        streams.append(_safe_decode(reader, contents))
    elif isinstance(contents, list):
        for item in contents:
            obj = reader.resolve(item)
            if isinstance(obj, Stream):
                streams.append(_safe_decode(reader, obj))
    return b" ".join(streams)


def _safe_decode(reader: PdfReader, stm: Stream) -> bytes:
    try:
        return stm.decode(resolve=reader.resolve)
    except Exception:
        return b""

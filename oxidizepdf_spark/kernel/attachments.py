"""Embedded-file (attachment) extraction.

BEYOND-REFERENCE, spec-driven (ISO 32000-1 §7.11 file specifications,
§7.7.4 name dictionary, §12.5.6.15 file-attachment annotations): the
reference only touches /EmbeddedFiles in its PDF/A validator
(pdfa/validator.rs — PDF/A-1 forbids them) and in write-side embedded-
file ENCRYPTION (encryption/embedded_files.rs); it has no attachment
READ path. A corpus-ingest pipeline wants attachment payloads — CSVs,
XMLs, source documents shipped inside the PDF — so this module reads
them:

- the catalog ``/Names → /EmbeddedFiles`` name tree (the same
  depth-guarded, cycle-safe walk as named destinations), and
- per-page ``/Annots`` entries with /Subtype /FileAttachment, whose
  /FS filespec points at the same structure.

Each record carries the name-tree key or annotation fallback, the
filespec file name (/UF preferred over /F, matching the engine's
GoToR/Launch precedence), /Desc, the DECODED payload bytes (the /EF
stream runs through the normal filter chain, so Flate'd attachments
come out plain and encrypted documents decrypt transparently), and the
/Params metadata (/Size /CreationDate /ModDate /CheckSum).
"""

from __future__ import annotations

from .objects import Ref, Stream


def _spec_name(reader, spec: dict):
    """/UF over /F (same precedence as extract.py GoToR/Launch)."""
    for key in ("UF", "F"):
        v = reader.resolve(spec.get(key))
        if isinstance(v, bytes):
            return v.decode("latin-1")
        if isinstance(v, str):
            return v
    return None


def _file_record(reader, spec, name, source, page=None):
    spec = reader.resolve(spec)
    if not isinstance(spec, dict):
        return None
    ef = reader.resolve(spec.get("EF"))
    if not isinstance(ef, dict):
        return None
    stream = None
    for key in ("UF", "F"):
        cand = reader.resolve(ef.get(key))
        if isinstance(cand, Stream):
            stream = cand
            break
    if stream is None:
        return None
    try:
        payload = stream.decode(reader.resolve)
    except Exception:
        payload = bytes(stream.raw)  # undecodable filter: raw bytes

    desc = reader.resolve(spec.get("Desc"))
    if isinstance(desc, bytes):
        desc = desc.decode("latin-1")
    elif not isinstance(desc, str):
        desc = None

    params = reader.resolve(stream.dict.get("Params"))
    rec_params = {}
    if isinstance(params, dict):
        size = reader.resolve(params.get("Size"))
        if isinstance(size, int):
            rec_params["size"] = size
        for pdf_key, out_key in (
            ("CreationDate", "creation_date"),
            ("ModDate", "mod_date"),
        ):
            v = reader.resolve(params.get(pdf_key))
            if isinstance(v, bytes):
                rec_params[out_key] = v.decode("latin-1")
            elif isinstance(v, str):
                rec_params[out_key] = v
        checksum = reader.resolve(params.get("CheckSum"))
        if isinstance(checksum, bytes):
            rec_params["checksum"] = checksum.hex()

    return {
        "name": name,
        "file_name": _spec_name(reader, spec),
        "description": desc,
        "data": payload,
        "n_bytes": len(payload),
        "params": rec_params,
        "source": source,
        "page": page,
    }


def extract_attachments(data: bytes, password=None) -> list[dict]:
    """All embedded files: name-tree entries first (tree order), then
    file-attachment annotations page by page."""
    from .pages import flatten_page_tree
    from .reader import PdfReader

    reader = PdfReader(data, password=password)
    out: list[dict] = []

    catalog = reader.catalog()
    names = reader.resolve(catalog.get("Names"))
    if isinstance(names, dict):
        seen: set = set()

        def walk(node, depth):
            if isinstance(node, Ref):
                if node in seen:
                    return
                seen.add(node)
            node = reader.resolve(node)
            if not isinstance(node, dict) or depth > 64:
                return
            pairs = reader.resolve(node.get("Names"))
            if isinstance(pairs, list):
                for i in range(0, len(pairs) - 1, 2):
                    key = reader.resolve(pairs[i])
                    if isinstance(key, bytes):
                        key = key.decode("latin-1")
                    if not isinstance(key, str):
                        key = None
                    rec = _file_record(reader, pairs[i + 1], key, "names")
                    if rec is not None:
                        out.append(rec)
            kids = reader.resolve(node.get("Kids"))
            if isinstance(kids, list):
                for kid in kids:
                    walk(kid, depth + 1)

        walk(names.get("EmbeddedFiles"), 0)

    try:
        pages = flatten_page_tree(reader)
    except Exception:
        pages = []
    for idx, page in enumerate(pages):
        annots = reader.resolve(page.dict.get("Annots"))
        if not isinstance(annots, list):
            continue
        for a in annots:
            a = reader.resolve(a)
            if not isinstance(a, dict):
                continue
            if str(a.get("Subtype", "")) != "FileAttachment":
                continue
            name = reader.resolve(a.get("T"))
            if isinstance(name, bytes):
                name = name.decode("latin-1")
            elif not isinstance(name, str):
                name = None
            rec = _file_record(reader, a.get("FS"), name, "annotation", idx)
            if rec is not None:
                out.append(rec)
    return out

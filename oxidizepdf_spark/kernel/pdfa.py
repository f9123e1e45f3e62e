"""PDF/A conformance validation, read-side (reference:
oxidize-pdf-core/src/pdfa/ — validator.rs, types.rs, error.rs, xmp.rs).

The same check sequence as PdfAValidator::validate (validator.rs:76):
encryption, PDF version, XMP + pdfaid identifier, JavaScript, external
references in OpenAction, transparency (PDF/A-1 only), LZW compression
(PDF/A-1 only), embedded files (forbidden below PDF/A-3), font
embedding (+ ToUnicode for conformance A), and device-dependent color
spaces without an OutputIntent.  Error strings carry the reference's
ValidationError variant names and message payloads (error.rs:7-70) so a
report diff against the reference is line-comparable.

As a corpus-quality gate this flags documents whose *claimed* PDF/A
level (XMP pdfaid) doesn't hold — a useful archival-grade signal when
filtering a 10^12-document crawl."""

from __future__ import annotations

from .objects import Ref, Stream
from .reader import EncryptedPdfError, PdfReader

# types.rs PdfALevel: part + conformance per level tag
_LEVELS = {"1a", "1b", "2a", "2b", "2u", "3a", "3b", "3u"}


def _part(level: str) -> int:
    return int(level[0])


def _conformance(level: str) -> str:
    return level[1].upper()


def validate_pdfa(
    data: bytes, level: str = "1b", password: str | None = None
) -> dict:
    """PdfAValidator::validate (validator.rs:76) → {level, is_compliant,
    errors, warnings}.  ``level`` is '1a'|'1b'|'2a'|'2b'|'2u'|'3a'|'3b'|
    '3u' (types.rs PdfALevel)."""
    level = level.lower()
    if level not in _LEVELS:
        raise ValueError(f"Invalid PDF/A level: {level}")
    part = _part(level)
    conformance = _conformance(level)
    errors: list[str] = []
    warnings: list[str] = []
    result = {
        "level": level, "is_compliant": False,
        "errors": errors, "warnings": warnings,
    }

    try:
        reader = PdfReader(data, password=password)
    except EncryptedPdfError:
        errors.append("EncryptionForbidden")
        return result
    except Exception as e:
        errors.append(f"ParseError: {e}")
        return result

    # check_encryption (validator.rs:126)
    if "Encrypt" in reader.trailer:
        errors.append("EncryptionForbidden")

    # check_pdf_version (validator.rs:137): A-1 wants exactly 1.4,
    # A-2/A-3 accept 1.4..1.7
    major, minor = reader.version
    ok_version = (
        (major == 1 and minor == 4)
        if part == 1
        else (major == 1 and 4 <= minor <= 7)
    )
    if not ok_version:
        required = "1.4" if part == 1 else "1.7"
        errors.append(
            f"IncompatiblePdfVersion: actual={major}.{minor} required={required}"
        )

    catalog = reader.catalog()

    _check_metadata(reader, catalog, part, conformance, errors)
    _check_javascript(reader, catalog, errors)
    _check_external_refs(reader, catalog, errors)

    from .pages import flatten_page_tree

    pages = flatten_page_tree(reader)

    if part < 2:  # allows_transparency == part >= 2 (types.rs:95)
        _check_transparency(reader, pages, errors)
    if part < 2:  # allows_lzw == part >= 2 (types.rs:99)
        _check_lzw(reader, pages, errors)
    if part < 3:  # allows_embedded_files == part >= 3 (types.rs:103)
        names = reader.resolve(catalog.get("Names"))
        if isinstance(names, dict) and "EmbeddedFiles" in names:
            errors.append("EmbeddedFileForbidden")

    _check_fonts(reader, pages, conformance == "A", errors)
    _check_color_spaces(reader, catalog, pages, errors)

    result["is_compliant"] = not errors
    return result


def _check_metadata(reader, catalog, part, conformance, errors) -> None:
    """check_metadata_from_data (validator.rs:227)."""
    import re

    md = reader.resolve(catalog.get("Metadata"))
    if not isinstance(md, Stream):
        errors.append("XmpMetadataMissing")
        return
    try:
        xmp = md.decode(resolve=reader.resolve).decode("utf-8", "replace")
    except Exception:
        errors.append("XmpMetadataMissing")
        return
    if "x:xmpmeta" not in xmp and "xpacket" not in xmp:
        errors.append("XmpMetadataMissing")
        return
    m = re.search(r"pdfaid:part(?:>\s*(\d+)\s*<|=\"(\d+)\")", xmp)
    if not m:
        errors.append("XmpMissingPdfAIdentifier")
        return
    found_part = int(m.group(1) or m.group(2))
    mc = re.search(
        r"pdfaid:conformance(?:>\s*([A-Ua-u])\s*<|=\"([A-Ua-u])\")", xmp
    )
    found_conf = (mc.group(1) or mc.group(2)).upper() if mc else None
    if found_part != part:
        errors.append(
            "XmpInvalidPdfAIdentifier: "
            f"Part mismatch: expected {part}, found {found_part}"
        )
    elif found_conf != conformance:
        errors.append(
            "XmpInvalidPdfAIdentifier: "
            f"Conformance mismatch: expected {conformance}, found {found_conf}"
        )


def _is_js_action(reader, obj) -> bool:
    d = reader.resolve(obj)
    return isinstance(d, dict) and str(d.get("S")) == "JavaScript"


def _check_javascript(reader, catalog, errors) -> None:
    """check_javascript_from_data (validator.rs:315): Names/JavaScript,
    OpenAction, Catalog/AA."""
    names = reader.resolve(catalog.get("Names"))
    if isinstance(names, dict) and "JavaScript" in names:
        errors.append("JavaScriptForbidden: Names/JavaScript")
    if _is_js_action(reader, catalog.get("OpenAction")):
        errors.append("JavaScriptForbidden: OpenAction")
    aa = reader.resolve(catalog.get("AA"))
    if isinstance(aa, dict) and any(
        _is_js_action(reader, v) for v in aa.values()
    ):
        errors.append("JavaScriptForbidden: Catalog/AA")


def _check_external_refs(reader, catalog, errors) -> None:
    """check_external_references_from_data (validator.rs:425): an
    OpenAction of type GoToR/GoToE/Launch."""
    action = reader.resolve(catalog.get("OpenAction"))
    if isinstance(action, dict):
        s = str(action.get("S"))
        if s in ("GoToR", "GoToE", "Launch"):
            errors.append(f"ExternalReferenceForbidden: {s}")


def _check_transparency(reader, pages, errors) -> None:
    """check_transparency + check_ext_gstate_transparency +
    check_xobject_transparency (validator.rs:465-752): /CA, /ca != 1,
    /SMask != None, /BM not Normal/Compatible in ExtGStates; XObject
    transparency groups; image XObjects with /SMask."""
    for idx, page in enumerate(pages):
        res = page.resources
        gs_dict = reader.resolve(res.get("ExtGState"))
        if isinstance(gs_dict, dict):
            for gs_name, gs in gs_dict.items():
                gs = reader.resolve(gs)
                if not isinstance(gs, dict):
                    continue
                for key in ("CA", "ca"):
                    v = reader.resolve(gs.get(key))
                    if isinstance(v, (int, float)) and not isinstance(v, bool) \
                            and abs(float(v) - 1.0) > 1e-12:
                        errors.append(
                            "TransparencyForbidden: "
                            f"Page {idx + 1}, ExtGState/{gs_name}/{key}"
                        )
                smask = gs.get("SMask")
                if smask is not None and str(smask) != "None":
                    errors.append(
                        "TransparencyForbidden: "
                        f"Page {idx + 1}, ExtGState/{gs_name}/SMask"
                    )
                bm = gs.get("BM")
                if bm is not None and str(bm) not in ("Normal", "Compatible"):
                    errors.append(
                        "TransparencyForbidden: "
                        f"Page {idx + 1}, ExtGState/{gs_name}/BM={bm}"
                    )
        xobjs = reader.resolve(res.get("XObject"))
        if isinstance(xobjs, dict):
            for xo_name, xo in xobjs.items():
                xo = reader.resolve(xo)
                xd = xo.dict if isinstance(xo, Stream) else xo
                if not isinstance(xd, dict):
                    continue
                group = reader.resolve(xd.get("Group"))
                if isinstance(group, dict) and str(group.get("S")) == "Transparency":
                    errors.append(
                        "TransparencyForbidden: "
                        f"Page {idx + 1}, XObject/{xo_name} has transparency group"
                    )
                if str(xd.get("Subtype")) == "Image" and "SMask" in xd:
                    errors.append(
                        "TransparencyForbidden: "
                        f"Page {idx + 1}, Image XObject/{xo_name} has SMask"
                    )


def _filters_of(stream_dict, reader) -> list[str]:
    f = reader.resolve(stream_dict.get("Filter"))
    if f is None:
        return []
    if isinstance(f, list):
        return [str(reader.resolve(x)) for x in f]
    return [str(f)]


def _check_lzw(reader, pages, errors) -> None:
    """check_lzw_compression (validator.rs:752): page /Contents and
    XObject streams must not use LZWDecode."""
    for idx, page in enumerate(pages):
        contents = page.dict.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        for ref in refs:
            obj = reader.resolve(ref)
            if isinstance(obj, Stream) and "LZWDecode" in _filters_of(
                obj.dict, reader
            ):
                num = ref.num if isinstance(ref, Ref) else 0
                errors.append(
                    f"LzwCompressionForbidden: page {idx + 1}, object {num} 0"
                )
        xobjs = reader.resolve(page.resources.get("XObject"))
        if isinstance(xobjs, dict):
            for xo_name, xo in xobjs.items():
                ref = xo
                xo = reader.resolve(xo)
                if isinstance(xo, Stream) and "LZWDecode" in _filters_of(
                    xo.dict, reader
                ):
                    num = ref.num if isinstance(ref, Ref) else 0
                    errors.append(
                        f"LzwCompressionForbidden: page {idx + 1}, "
                        f"object {num} 0"
                    )


def _has_fontfile(reader, desc) -> bool:
    return isinstance(desc, dict) and any(
        k in desc for k in ("FontFile", "FontFile2", "FontFile3")
    )


def _check_fonts(reader, pages, requires_tounicode, errors) -> None:
    """check_fonts / check_single_font / check_type0_font
    (validator.rs:914-1160): every font embedded via FontFile*;
    conformance A additionally wants ToUnicode (Type0: unless
    Identity-H/V; simple: unless /Encoding present; Type3: always)."""
    seen: set = set()
    for page in pages:
        fonts = reader.resolve(page.resources.get("Font"))
        if not isinstance(fonts, dict):
            continue
        for name, font in fonts.items():
            font = reader.resolve(font)
            if not isinstance(font, dict) or name in seen:
                continue
            seen.add(name)
            subtype = str(font.get("Subtype", ""))
            if subtype == "Type3":
                if requires_tounicode and "ToUnicode" not in font:
                    errors.append(f"FontMissingToUnicode: {name}")
                continue
            if subtype == "Type0":
                desc_fonts = reader.resolve(font.get("DescendantFonts"))
                if not isinstance(desc_fonts, list):
                    errors.append(f"FontNotEmbedded: {name}")
                else:
                    for df in desc_fonts:
                        df = reader.resolve(df)
                        desc = (
                            reader.resolve(df.get("FontDescriptor"))
                            if isinstance(df, dict)
                            else None
                        )
                        if not _has_fontfile(reader, desc):
                            errors.append(f"FontNotEmbedded: {name}")
                if requires_tounicode and "ToUnicode" not in font:
                    enc = font.get("Encoding")
                    if str(enc) not in ("Identity-H", "Identity-V"):
                        errors.append(f"FontMissingToUnicode: {name}")
                continue
            desc = reader.resolve(font.get("FontDescriptor"))
            if not _has_fontfile(reader, desc):
                errors.append(f"FontNotEmbedded: {name}")
            if requires_tounicode and "ToUnicode" not in font \
                    and "Encoding" not in font:
                errors.append(f"FontMissingToUnicode: {name}")


_DEVICE_CS = {"DeviceRGB", "DeviceCMYK", "DeviceGray"}


def _cs_type(reader, value) -> str | None:
    value = reader.resolve(value)
    if isinstance(value, list) and value:
        value = reader.resolve(value[0])
    if isinstance(value, str):
        return str(value)
    return None


def _check_color_spaces(reader, catalog, pages, errors) -> None:
    """check_color_spaces (validator.rs:1166): device-dependent color
    spaces require a catalog /OutputIntents entry."""
    intents = reader.resolve(catalog.get("OutputIntents"))
    has_intent = isinstance(intents, list) and len(intents) > 0
    if has_intent:
        return
    for idx, page in enumerate(pages):
        cs_dict = reader.resolve(page.resources.get("ColorSpace"))
        if isinstance(cs_dict, dict):
            for cs_name, cs_value in cs_dict.items():
                t = _cs_type(reader, cs_value)
                if t in _DEVICE_CS:
                    errors.append(
                        f"InvalidColorSpace: {t} at Page {idx + 1}, "
                        f"ColorSpace/{cs_name}"
                    )
        xobjs = reader.resolve(page.resources.get("XObject"))
        if isinstance(xobjs, dict):
            for xo_name, xo in xobjs.items():
                xo = reader.resolve(xo)
                xd = xo.dict if isinstance(xo, Stream) else xo
                if isinstance(xd, dict) and str(xd.get("Subtype")) == "Image":
                    t = _cs_type(reader, xd.get("ColorSpace"))
                    if t in _DEVICE_CS:
                        errors.append(
                            f"InvalidColorSpace: {t} at Page {idx + 1}, "
                            f"XObject/{xo_name}"
                        )


def validate_claimed_pdfa(data: bytes, password: str | None = None) -> dict:
    """Corpus-gate form: validate a document against its OWN claimed
    PDF/A level (XMP pdfaid part+conformance).  No claim → {claimed:
    None, is_compliant: False} without running level checks — a document
    that doesn't claim PDF/A simply isn't archival-grade, which is the
    signal a quality filter wants."""
    import re

    try:
        reader = PdfReader(data, password=password)
        md = reader.resolve(reader.catalog().get("Metadata"))
        xmp = (
            md.decode(resolve=reader.resolve).decode("utf-8", "replace")
            if isinstance(md, Stream)
            else ""
        )
    except Exception:
        return {"claimed": None, "is_compliant": False,
                "errors": ["ParseError"], "warnings": []}
    m = re.search(r"pdfaid:part(?:>\s*(\d+)\s*<|=\"(\d+)\")", xmp)
    mc = re.search(
        r"pdfaid:conformance(?:>\s*([A-Ua-u])\s*<|=\"([A-Ua-u])\")", xmp
    )
    if not m or not mc:
        return {"claimed": None, "is_compliant": False, "errors": [],
                "warnings": []}
    level = f"{m.group(1) or m.group(2)}{(mc.group(1) or mc.group(2)).lower()}"
    if level not in _LEVELS:
        return {"claimed": level, "is_compliant": False,
                "errors": [f"XmpInvalidPdfAIdentifier: unknown level {level}"],
                "warnings": []}
    out = validate_pdfa(data, level, password=password)
    out["claimed"] = level
    return out

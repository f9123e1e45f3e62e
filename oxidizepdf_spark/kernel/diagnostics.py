"""Corruption triage diagnostics (reference: recovery/corruption.rs).

``detect_corruption`` mirrors the reference's report semantics
(corruption.rs:85-272): header check (instant severity-10 bail),
%%EOF presence in the trailing 1 KiB (severity >= 5), xref-keyword scan
(0 hits -> severity >= 8; note the reference's find_pattern also counts
the 'xref' inside 'startxref' — mirrored), ' obj' counting with
'/Type /Page' detection in the following 200 bytes (0 objects ->
severity 10), and the error-string-driven corruption-type
classification including the Multiple case.

In the corpus pipeline this is the cheap pre-parse health probe: a
severity histogram over an ingest batch tells you whether a source
needs the recovery path before you pay full extraction for it."""

from __future__ import annotations


def _scan_count(buf: bytes, needle: bytes, ahead: int = 0):
    """Occurrence positions, advancing len(needle) per hit like the
    reference's loop (pos = hit + 4)."""
    out = []
    pos = 0
    while True:
        i = buf.find(needle, pos)
        if i < 0:
            break
        out.append(i)
        pos = i + len(needle)
    return out


def detect_corruption(data: bytes) -> dict:
    """corruption.rs:85 detect_corruption over in-memory bytes."""
    report = {
        "corruption_type": "Unknown",
        "severity": 0,
        "errors": [],
        "sections": [],  # (section_type, start, end, confidence)
        "file_size": len(data),
        "readable_bytes": 0,
        "estimated_objects": 0,
        "found_pages": 0,
    }
    # header (corruption.rs:125-149)
    if len(data) < 8 or data[0:5] != b"%PDF-":
        report["errors"].append(
            "Cannot read header" if len(data) < 8 else "Invalid PDF header"
        )
        report["corruption_type"] = "InvalidHeader"
        report["severity"] = 10
        return report
    report["sections"].append(("Header", 0, 8, 1.0))

    # %%EOF in the trailing 1 KiB (corruption.rs:151-173)
    tail = data[max(0, len(data) - 1024) :]
    if b"%%EOF" not in tail:
        report["errors"].append("Missing %%EOF marker")
        report["severity"] = max(report["severity"], 5)
    if not report["errors"] and report["severity"] == 0:
        # the reference always reports SOMETHING for analysis
        report["errors"].append("PDF structure analysis complete")

    # xref scan (corruption.rs:175-205) — counts 'startxref' hits too,
    # exactly like the reference's naive pattern scan
    xrefs = _scan_count(data, b"xref")
    for p in xrefs:
        report["sections"].append(("XRef", p, p + 100, 0.8))
    if not xrefs:
        report["errors"].append("No cross-reference tables found")
        report["severity"] = max(report["severity"], 8)

    # object census (corruption.rs:207-246)
    objs = _scan_count(data, b" obj")
    pages = 0
    for p in objs:
        if b"/Type /Page" in data[p : min(p + 200, len(data))]:
            pages += 1
    report["estimated_objects"] = len(objs)
    report["found_pages"] = pages
    report["readable_bytes"] = len(data)
    if not objs:
        report["errors"].append("No PDF objects found")
        report["severity"] = 10

    # classification from error strings (corruption.rs:248-272)
    types = []
    for err in report["errors"]:
        if "header" in err:
            types.append("InvalidHeader")
        elif "EOF" in err:
            types.append("MissingEOF")
        elif "cross-reference" in err or "xref" in err:
            types.append("CorruptXRef")
    if not types:
        pass  # stays Unknown (reference leaves the default in place)
    elif len(types) == 1:
        report["corruption_type"] = types[0]
    else:
        report["corruption_type"] = "Multiple"
    report["types"] = types
    return report


def is_corrupted(data: bytes) -> bool:
    """corruption.rs:283 is_corrupted — any nonzero severity counts."""
    try:
        return detect_corruption(data)["severity"] > 0
    except Exception:
        return True

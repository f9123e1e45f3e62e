"""Permission flags (kernel/permissions.py — parity with
encryption/permissions.rs Table 22) and embedded-file extraction
(kernel/attachments.py — beyond-reference, spec-driven §7.11/§12.5.6.15)."""

from __future__ import annotations

import zlib

from oxidizepdf_spark.corpus import (
    build_encrypted_pdf,
    build_pdf_with_content_stream,
    build_text_pdf,
)
from oxidizepdf_spark.kernel.attachments import extract_attachments
from oxidizepdf_spark.kernel.permissions import (
    Permissions,
    document_permissions,
)


# ---------------------------------------------------------------------------
# Permissions (permissions.rs tests mirrored)
# ---------------------------------------------------------------------------


def test_permissions_base_and_all():
    p = Permissions.new()
    assert p.bits == 0xFFFFF0C0  # permissions.rs:50
    assert not p.can_print() and not p.can_copy()
    a = Permissions.all()
    assert a.bits == 0xFFFFF0C0 | 0x0F3C
    assert a.can_print() and a.can_copy() and a.can_assemble()
    assert a.can_modify_contents() and a.can_fill_forms()
    assert a.can_access_for_accessibility() and a.can_print_high_quality()


def test_permissions_bit_positions():
    # Table 22 1-based bit positions
    assert Permissions.from_bits(1 << 2).can_print()
    assert Permissions.from_bits(1 << 3).can_modify_contents()
    assert Permissions.from_bits(1 << 4).can_copy()
    assert Permissions.from_bits(1 << 5).can_modify_annotations()
    assert Permissions.from_bits(1 << 8).can_fill_forms()
    assert Permissions.from_bits(1 << 9).can_access_for_accessibility()
    assert Permissions.from_bits(1 << 10).can_assemble()
    assert Permissions.from_bits(1 << 11).can_print_high_quality()


def test_permissions_from_flags_and_contains():
    p = Permissions.from_flags(print=True, copy=True)
    assert p.can_print() and p.can_copy()
    assert not p.can_modify_contents()
    only_print = Permissions.from_flags(print=True)
    assert p.contains(only_print)
    assert not only_print.contains(p)
    flags = p.flags()
    assert flags["print"] and flags["copy"] and not flags["assemble"]


def test_permissions_set_clear_roundtrip():
    p = Permissions.all()
    p.set("copy", False)
    assert not p.can_copy() and p.can_print()
    p.set("copy", True)
    assert p.can_copy()


def test_document_permissions_from_encrypted_pdf():
    # default fixture /P = -4 → 0xFFFFFFFC: every flag set
    pdf = build_encrypted_pdf("secret text", method="rc4-128")
    p = document_permissions(pdf)
    assert p is not None
    assert p.can_print() and p.can_copy() and p.can_assemble()

    # copy+print masked off: -4 & ~(1<<4) & ~(1<<2)
    restricted = -4 & ~(1 << 4) & ~(1 << 2)
    pdf = build_encrypted_pdf("secret", method="rc4-128", p=restricted)
    p = document_permissions(pdf)
    assert not p.can_copy() and not p.can_print()
    assert p.can_modify_contents()  # untouched bit stays set

    # unencrypted → None (everything implicitly allowed)
    assert document_permissions(build_text_pdf("open doc")) is None


# ---------------------------------------------------------------------------
# Attachments
# ---------------------------------------------------------------------------


def _attachment_pdf(payload: bytes, compress=False, params=b"", desc=""):
    if compress:
        body = zlib.compress(payload)
        stream_dict = (
            b"<< /Type /EmbeddedFile /Filter /FlateDecode %s/Length %d >>"
            % (params, len(body))
        )
    else:
        body = payload
        stream_dict = b"<< /Type /EmbeddedFile %s/Length %d >>" % (
            params, len(body),
        )
    desc_part = f"/Desc ({desc}) " if desc else ""
    filespec = (
        b"<< /Type /Filespec /F (data.bin) /UF (report.csv) %s/EF << /F 33 0 R >> >>"
        % desc_part.encode("latin-1")
    )
    return build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (doc body) Tj ET",
        catalog_extra="/Names << /EmbeddedFiles << /Names [(report.csv) 32 0 R] >> >>",
        extra_objects={
            32: filespec,
            33: stream_dict + b"\nstream\n" + body + b"\nendstream",
        },
    )


def test_attachment_from_name_tree():
    payload = b"a,b,c\n1,2,3\n"
    pdf = _attachment_pdf(payload)
    atts = extract_attachments(pdf)
    assert len(atts) == 1
    a = atts[0]
    assert a["name"] == "report.csv"
    assert a["file_name"] == "report.csv"  # /UF preferred over /F
    assert a["data"] == payload
    assert a["n_bytes"] == len(payload)
    assert a["source"] == "names" and a["page"] is None


def test_attachment_flate_decoded_with_params():
    payload = b"x" * 500
    params = (
        b"/Params << /Size 500 /CreationDate (D:20240101120000Z) "
        b"/CheckSum <AABB> >> "
    )
    pdf = _attachment_pdf(payload, compress=True, params=params, desc="raw dump")
    atts = extract_attachments(pdf)
    a = atts[0]
    assert a["data"] == payload  # filter chain applied
    assert a["description"] == "raw dump"
    assert a["params"]["size"] == 500
    assert a["params"]["creation_date"] == "D:20240101120000Z"
    assert a["params"]["checksum"] == "aabb"


def test_attachment_from_file_annotation():
    payload = b"attached-note-data"
    filespec = (
        b"<< /Type /Filespec /F (note.txt) /EF << /F 33 0 R >> >>"
    )
    stream = b"<< /Type /EmbeddedFile /Length %d >>\nstream\n%s\nendstream" % (
        len(payload), payload,
    )
    annot = (
        b"<< /Type /Annot /Subtype /FileAttachment /Rect [10 10 30 30] "
        b"/T (reviewer) /FS 32 0 R >>"
    )
    pdf = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (x) Tj ET",
        page_dict_extra=" /Annots [34 0 R]",
        extra_objects={32: filespec, 33: stream, 34: annot},
    )
    atts = extract_attachments(pdf)
    assert len(atts) == 1
    a = atts[0]
    assert a["source"] == "annotation" and a["page"] == 0
    assert a["name"] == "reviewer"
    assert a["file_name"] == "note.txt"
    assert a["data"] == payload


def test_no_attachments():
    assert extract_attachments(build_text_pdf("plain")) == []

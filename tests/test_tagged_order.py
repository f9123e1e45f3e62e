"""Tagged-PDF reading order (VERDICT r3 next #5: structure/tagged.rs +
marked_content.rs — /StructTreeRoot MCID order as the authoritative
reading order where the document carries it)."""

from oxidizepdf_spark.corpus import assemble_pdf, _stream_obj
from oxidizepdf_spark.kernel.extract import extract_pdf_bytes
from oxidizepdf_spark.kernel.reader import PdfReader
from oxidizepdf_spark.kernel.extract import structure_mcid_order
from oxidizepdf_spark.kernel.textstate import ExtractionOptions


def _tagged_pdf(k_form: str = "elems") -> bytes:
    """Two tagged paragraphs whose STRUCTURE order contradicts both the
    emission order and geometry: 'Alpha' (MCID 0, y=700) emits first and
    sits higher, but the tree declares MCID 1 ('Beta') first."""
    content = (
        b"/P << /MCID 0 >> BDC BT /F1 12 Tf 100 700 Td (Alpha) Tj ET EMC "
        b"/P << /MCID 1 >> BDC BT /F1 12 Tf 100 600 Td (Beta) Tj ET EMC"
    )
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 30 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> >>"
        ),
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: _stream_obj(b"", content),
        30: b"<< /Type /StructTreeRoot /K 31 0 R >>",
    }
    if k_form == "elems":
        objects[31] = (
            b"<< /Type /StructElem /S /Document /Pg 3 0 R /K [33 0 R 32 0 R] >>"
        )
        objects[32] = b"<< /Type /StructElem /S /P /Pg 3 0 R /K 0 >>"
        objects[33] = b"<< /Type /StructElem /S /P /Pg 3 0 R /K 1 >>"
    elif k_form == "mcr":
        objects[31] = (
            b"<< /Type /StructElem /S /Document /Pg 3 0 R /K "
            b"[<< /Type /MCR /Pg 3 0 R /MCID 1 >> "
            b"<< /Type /MCR /Pg 3 0 R /MCID 0 >>] >>"
        )
    elif k_form == "ints":
        # integer MCIDs inherit the element's /Pg
        objects[31] = (
            b"<< /Type /StructElem /S /Document /Pg 3 0 R /K [1 0] >>"
        )
    return assemble_pdf(objects)


def test_structure_mcid_order_walk():
    for form in ("elems", "mcr", "ints"):
        reader = PdfReader(_tagged_pdf(form))
        assert structure_mcid_order(reader) == {0: [1, 0]}, form


def test_structure_order_beats_emission_and_geometry():
    pdf = _tagged_pdf()
    emission = extract_pdf_bytes(pdf)
    assert "Alpha" in emission.page_texts[0]
    assert emission.page_texts[0].index("Alpha") < emission.page_texts[0].index("Beta")
    structured = extract_pdf_bytes(
        pdf, ExtractionOptions(reading_order="structure")
    )
    txt = structured.page_texts[0]
    assert txt.index("Beta") < txt.index("Alpha"), txt
    # simple (geometric) order also keeps Alpha first — structure differs
    simple = extract_pdf_bytes(pdf, ExtractionOptions(reading_order="simple"))
    assert simple.page_texts[0].index("Alpha") < simple.page_texts[0].index("Beta")


def test_structure_untagged_page_falls_back_to_simple():
    from oxidizepdf_spark.corpus import build_text_pdf

    pdf = build_text_pdf("one\ntwo\nthree")
    res = extract_pdf_bytes(pdf, ExtractionOptions(reading_order="structure"))
    assert res.error is None
    assert res.page_texts[0] == "one\ntwo\nthree"


def test_untagged_fragments_append_after_tagged():
    """A fragment outside any marked-content scope keeps emission position
    after the structure-ordered ones."""
    content = (
        b"BT /F1 12 Tf 100 500 Td (Loose) Tj ET "
        b"/P << /MCID 0 >> BDC BT /F1 12 Tf 100 700 Td (Tagged) Tj ET EMC"
    )
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 30 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> >>"
        ),
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: _stream_obj(b"", content),
        30: b"<< /Type /StructTreeRoot /K 31 0 R >>",
        31: b"<< /Type /StructElem /S /P /Pg 3 0 R /K 0 >>",
    }
    res = extract_pdf_bytes(
        assemble_pdf(objects), ExtractionOptions(reading_order="structure")
    )
    txt = res.page_texts[0]
    assert txt.index("Tagged") < txt.index("Loose"), txt

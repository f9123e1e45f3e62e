"""SQL function-surface tests: the engine callable from spark.sql."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def spark():
    from oxidizepdf_spark.functions import register_sql_functions
    from oxidizepdf_spark.table_io import get_spark

    s = get_spark(app_name="pytest-sqlfn", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    register_sql_functions(s)
    yield s
    s.stop()


def test_sql_extract_text_and_pages(spark):
    from oxidizepdf_spark.corpus import build_text_pdf

    pdf = build_text_pdf("hello from sql land")
    df = spark.createDataFrame([("d1", bytearray(pdf)), ("d2", None)], "doc_id string, pdf binary")
    df.createOrReplaceTempView("corpus")
    rows = spark.sql(
        "SELECT doc_id, oxpdf_extract_text(pdf) AS text, oxpdf_page_count(pdf) AS pages "
        "FROM corpus ORDER BY doc_id"
    ).collect()
    assert rows[0]["text"] == "hello from sql land" and rows[0]["pages"] == 1
    assert rows[1]["text"] is None and rows[1]["pages"] == 0


def test_sql_metadata_json(spark):
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream

    pdf = build_pdf_with_content_stream(
        b"BT /F1 12 Tf 100 700 Td (X) Tj ET", info={"Title": "SQL Doc"}
    )
    df = spark.createDataFrame([(bytearray(pdf),)], "pdf binary")
    df.createOrReplaceTempView("one_pdf")
    meta = json.loads(
        spark.sql("SELECT oxpdf_metadata_json(pdf) AS m FROM one_pdf").collect()[0]["m"]
    )
    assert meta["title"] == "SQL Doc" and meta["n_pages"] == 1


def test_sql_password_tables_elements(spark):
    import json as _json

    from oxidizepdf_spark.corpus import (
        build_encrypted_pdf,
        build_sectioned_pdf,
        build_table_pdf,
    )

    enc = build_encrypted_pdf("vault text", method="aes-128", user_pw=b"k")
    tab = build_table_pdf([["a", "b"], ["c", "d"]])
    sec = build_sectioned_pdf([("HEAD", [["body", "words", "here"]])])
    df = spark.createDataFrame(
        [(bytearray(enc), bytearray(tab), bytearray(sec))],
        "enc binary, tab binary, sec binary",
    )
    df.createOrReplaceTempView("mixed")
    row = spark.sql(
        "SELECT oxpdf_extract_text_pw(enc, 'k') AS t, "
        "oxpdf_extract_text_pw(enc, 'wrong') AS t_bad, "
        "oxpdf_tables_json(tab) AS tables, "
        "oxpdf_elements_json(sec) AS els FROM mixed"
    ).collect()[0]
    assert row["t"] == "vault text"
    assert row["t_bad"] == ""  # wrong password → no pages extracted
    tables = _json.loads(row["tables"])
    assert tables[0]["rows"] == 2 and tables[0]["cols"] == 2
    assert [c[2] for c in tables[0]["cells"]] == ["a", "b", "c", "d"]
    els = _json.loads(row["els"])
    assert [(e["kind"], e["text"]) for e in els] == [
        ("title", "HEAD"), ("paragraph", "body words here"),
    ]
    assert els[1]["heading"] == "HEAD"


def test_sql_html_main_content(spark):
    from oxidizepdf_spark.corpus import build_html_doc

    df = spark.createDataFrame(
        [(build_html_doc("clean main body content"),)], "html string"
    )
    df.createOrReplaceTempView("pages")
    row = spark.sql("SELECT oxhtml_main_content(html) AS t FROM pages").collect()[0]
    assert row["t"] == "clean main body content"


def test_sql_export_markdown_and_chunks_compact(spark):
    """Round-7 export surface in SQL: oxpdf_export_markdown renders a
    sectioned PDF + bordered table as '##' headings / paragraphs / pipe
    rows; oxtext_chunks_compact serializes DocumentChunker output in the
    #oxct/1 tabular format, parseable back."""
    from oxidizepdf_spark.corpus import build_sectioned_pdf, build_table_pdf
    from oxidizepdf_spark.kernel.ai_export import parse_chunks_compact

    sec = build_sectioned_pdf([("HEAD", [["body", "words", "here"]])])
    tab = build_table_pdf([["a", "b"], ["c", "d"]])
    text = " ".join(f"tok{i}" for i in range(30)) + " end."
    df = spark.createDataFrame(
        [(bytearray(sec), bytearray(tab), text)],
        "sec binary, tab binary, txt string",
    )
    df.createOrReplaceTempView("exp")
    row = spark.sql(
        "SELECT oxpdf_export_markdown(sec) AS md, "
        "oxpdf_export_markdown(tab) AS md_tab, "
        "oxtext_chunks_compact(txt) AS ch FROM exp"
    ).collect()[0]
    assert row["md"] == "# Document\n\n## HEAD\n\nbody words here"
    assert row["md_tab"] == (
        "# Document\n\n| a | b |\n| --- | --- |\n| c | d |"
    )
    chunks = parse_chunks_compact(row["ch"])
    assert len(chunks) == 1 and chunks[0]["tokens"] == 31
    assert chunks[0]["content"].endswith("end.")


def test_sql_corruption_json(spark):
    import json as _json

    from oxidizepdf_spark.corpus import build_pdf_with_content_stream

    ok = build_pdf_with_content_stream(b"BT /F1 12 Tf 72 720 Td (x) Tj ET")
    bad = ok.replace(b"%%EOF", b"%%XXX")
    df = spark.createDataFrame(
        [(bytearray(ok), bytearray(bad), bytearray(b"garbage bytes not pdf"))],
        "ok binary, bad binary, junk binary",
    )
    df.createOrReplaceTempView("health")
    row = spark.sql(
        "SELECT oxpdf_corruption_json(ok) AS ok, "
        "oxpdf_corruption_json(bad) AS bad, "
        "oxpdf_corruption_json(junk) AS junk FROM health"
    ).collect()[0]
    assert _json.loads(row["ok"])["severity"] == 0
    b = _json.loads(row["bad"])
    assert b["severity"] == 5 and b["corruption_type"] == "MissingEOF"
    assert _json.loads(row["junk"])["corruption_type"] == "InvalidHeader"


def test_sql_rag_chunks_json(spark):
    from oxidizepdf_spark.corpus import build_sectioned_pdf

    pdf = build_sectioned_pdf(
        [("Overview", [["alpha"] * 10, ["beta"] * 10])]
    )
    df = spark.createDataFrame(
        [("d1", bytearray(pdf)), ("d2", None)], "doc_id string, pdf binary"
    )
    df.createOrReplaceTempView("rag_corpus")
    rows = spark.sql(
        "SELECT doc_id, oxpdf_rag_chunks_json(pdf) AS chunks "
        "FROM rag_corpus ORDER BY doc_id"
    ).collect()
    chunks = json.loads(rows[0]["chunks"])
    assert chunks, "sectioned PDF must produce chunks"
    assert chunks[0]["chunk_index"] == 0
    # heading context + linked ids + metadata all present
    all_text = "\n".join(c["text"] for c in chunks)
    assert "Overview" in all_text and "alpha" in all_text
    for i, c in enumerate(chunks):
        assert c["metadata"]["chunk_id"].endswith(f":{i}")
        if i > 0:
            assert c["metadata"]["prev_chunk_id"] == chunks[i - 1]["metadata"]["chunk_id"]
    body = next(c for c in chunks if "alpha" in c["text"])
    assert body["heading_context"] == "Overview"
    assert body["metadata"]["heading_path"] == ["Overview"]
    assert body["metadata"]["word_count"] > 0
    assert rows[1]["chunks"] is None


def test_sql_images_json(spark):
    import zlib as _zlib

    pixels = bytes(range(16 * 16))
    comp = _zlib.compress(pixels)
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream

    body = (
        b"<< /Type /XObject /Subtype /Image /Width 16 /Height 16 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length %d >>\nstream\n%s\nendstream" % (len(comp), comp)
    )
    pdf = build_pdf_with_content_stream(
        b"q 100 0 0 100 0 0 cm /Im1 Do Q",
        page_extra="/XObject << /Im1 30 0 R >>",
        extra_objects={30: body},
    )
    df = spark.createDataFrame(
        [("d1", bytearray(pdf))], "doc_id string, pdf binary"
    )
    df.createOrReplaceTempView("img_corpus")
    row = spark.sql(
        "SELECT oxpdf_images_json(pdf) AS imgs FROM img_corpus"
    ).collect()[0]
    imgs = json.loads(row["imgs"])
    assert len(imgs) == 1
    assert imgs[0]["width"] == 16 and imgs[0]["format"] == "png"
    assert imgs[0]["name"] == "Im1" and imgs[0]["n_bytes"] > 0


def test_sql_signatures_json(spark):
    from oxidizepdf_spark.corpus import build_signed_pdf, build_text_pdf

    good = build_signed_pdf("ok doc", signer_cn="SQL Signer")
    bad = build_signed_pdf("bad doc", tamper_find=b"(bad")
    plain = build_text_pdf("unsigned")
    df = spark.createDataFrame(
        [("good", bytearray(good)), ("bad", bytearray(bad)),
         ("plain", bytearray(plain)), ("null", None)],
        "doc_id string, pdf binary",
    )
    df.createOrReplaceTempView("sigcorpus")
    rows = {
        r["doc_id"]: r["sigs"]
        for r in spark.sql(
            "SELECT doc_id, oxpdf_signatures_json(pdf) AS sigs FROM sigcorpus"
        ).collect()
    }
    good_sigs = json.loads(rows["good"])
    assert len(good_sigs) == 1
    assert good_sigs[0]["signer"] == "SQL Signer"
    assert good_sigs[0]["signature_valid"] is True
    bad_sigs = json.loads(rows["bad"])
    assert bad_sigs[0]["signature_valid"] is False
    assert json.loads(rows["plain"]) == []
    assert rows["null"] is None


def test_sql_entities_json(spark):
    from oxidizepdf_spark.corpus import build_sectioned_pdf

    pdf = build_sectioned_pdf([("HEAD", [["body", "words", "here"]])])
    df = spark.createDataFrame([("d", bytearray(pdf))], "doc_id string, pdf binary")
    df.createOrReplaceTempView("entcorpus")
    row = spark.sql(
        "SELECT oxpdf_entities_json(pdf) AS ents FROM entcorpus"
    ).collect()[0]
    emap = json.loads(row["ents"])
    ents = [e for page in emap["pages"].values() for e in page]
    assert any(
        e["type"] == "heading" and e["metadata"]["properties"]["content"] == "HEAD"
        for e in ents
    )


def test_sql_pdfa_json(spark):
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream

    claimed = build_pdf_with_content_stream(
        b"BT ET", xmp={"pdfaid_part": "1", "pdfaid_conformance": "b"}
    )
    unclaimed = build_pdf_with_content_stream(b"BT ET")
    df = spark.createDataFrame(
        [("c", bytearray(claimed)), ("u", bytearray(unclaimed))],
        "doc_id string, pdf binary",
    )
    df.createOrReplaceTempView("pdfacorpus")
    rows = {
        r["doc_id"]: json.loads(r["rep"])
        for r in spark.sql(
            "SELECT doc_id, oxpdf_pdfa_json(pdf) AS rep FROM pdfacorpus"
        ).collect()
    }
    assert rows["c"]["claimed"] == "1b"
    # Helvetica isn't embedded, so the claim doesn't hold
    assert rows["c"]["is_compliant"] is False
    assert "FontNotEmbedded: F1" in rows["c"]["errors"]
    assert rows["u"]["claimed"] is None

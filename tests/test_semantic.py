"""Semantic marking / AI-Ready entity export (semantic/ module parity:
entity.rs, marking.rs, export.rs) + entity derivation from the rich
partitioner."""

import json

from oxidizepdf_spark.corpus import build_sectioned_pdf
from oxidizepdf_spark.kernel.partition import partition_pdf_bytes
from oxidizepdf_spark.kernel.semantic import (
    BoundingBox,
    Entity,
    EntityMap,
    EntityMetadata,
    EntityRelation,
    SemanticEntity,
    SemanticMarker,
    entities_from_partition,
    entity_type_to_schema_org,
)


def test_bounding_box_geometry():
    bb = BoundingBox(10.0, 20.0, 100.0, 50.0, 1)
    assert bb.right() == 110.0 and bb.top() == 70.0 and bb.area() == 5000.0
    assert bb.intersects(BoundingBox(100.0, 60.0, 20.0, 20.0, 1))
    assert not bb.intersects(BoundingBox(200.0, 0.0, 10.0, 10.0, 1))
    # entity.rs:44 — different pages never intersect
    assert not bb.intersects(BoundingBox(10.0, 20.0, 100.0, 50.0, 2))


def test_entity_metadata_confidence_clamped():
    m = EntityMetadata().with_confidence(1.7)
    assert m.confidence == 1.0
    assert EntityMetadata().with_confidence(-0.5).confidence == 0.0


def test_relation_custom_externally_tagged():
    """RelationType::Custom lacks serde(untagged) — {'custom': s}; the
    standard variants are camelCase strings."""
    assert EntityRelation("e1", "isPartOf").to_dict()["relation_type"] == "isPartOf"
    assert EntityRelation("e1", "cites").to_dict()["relation_type"] == {
        "custom": "cites"
    }


def test_semantic_entity_builder_chain():
    e = (
        SemanticEntity("id1", "invoiceNumber", BoundingBox(0, 0, 10, 10, 1))
        .with_content("INV-42")
        .with_relationship("id2", "isPartOf")
    )
    d = e.to_dict()
    assert d["type"] == "invoiceNumber" and d["content"] == "INV-42"
    assert d["relationships"] == [
        {"target_id": "id2", "relation_type": "isPartOf"}
    ]


def test_marker_records_and_exports():
    """Deviation from marking.rs:57 (which drops the entity): marked
    regions land in export_entities()."""
    m = SemanticMarker()
    id1 = m.mark_table((10.0, 20.0, 300.0, 100.0), page=0).with_metadata(
        "rows", "3"
    ).with_confidence(0.9).build()
    id2 = m.mark_text((0.0, 0.0, 50.0, 10.0), page=1).build()
    m.add_schema("https://example.com/invoice-v1")
    em = m.export_entities()
    assert (id1, id2) == ("entity_1", "entity_2")  # deterministic ids
    assert [e.id for e in em.entities_on_page(0)] == ["entity_1"]
    assert em.entities_by_type("text")[0].id == "entity_2"
    assert em.schemas == ["https://example.com/invoice-v1"]


def test_entity_map_json_shape():
    em = EntityMap()
    em.document_metadata["title"] = "Doc"
    em.add_entity(Entity("e1", "heading", (1.0, 2.0, 3.0, 4.0), page=0))
    d = json.loads(em.to_json())
    assert d["document_metadata"] == {"title": "Doc"}
    assert d["pages"]["0"][0] == {
        "id": "e1",
        "type": "heading",
        "bounds": [1.0, 2.0, 3.0, 4.0],
        "page": 0,
        "metadata": {"properties": {}, "confidence": None, "schema": None},
    }
    assert json.loads(em.to_json_compact()) == d


def test_json_ld_schema_org():
    em = EntityMap()
    em.add_entity(
        Entity("e1", "invoice", (0.0, 0.0, 612.0, 792.0), page=0,
               metadata=EntityMetadata(confidence=0.8)
               .with_property("number", "INV-1"))
    )
    em.add_entity(Entity("e2", "percentage", (5.5, 0.0, 10.0, 10.0), page=1))
    em.schemas.append("https://example.com/s")
    em.document_metadata["name"] = "Q1"
    ld = json.loads(em.to_json_ld())
    assert ld["@context"] == "https://schema.org"
    assert ld["@type"] == "DigitalDocument"
    assert ld["additionalType"] == "AI-Ready PDF"
    assert ld["conformsTo"] == ["https://example.com/s"]
    assert ld["name"] == "Q1"
    p0, p1 = ld["hasPart"]
    assert p0["@type"] == "Invoice" and p0["@id"] == "e1"
    assert p0["pageStart"] == 1 and p1["pageStart"] == 2
    # Rust {} float Display: integral coords print without '.0'
    assert p0["spatialCoverage"]["geo"]["box"] == "0,0,612,792"
    assert p1["spatialCoverage"]["geo"]["box"] == "5.5,0,10,10"
    assert p0["number"] == "INV-1" and p0["confidence"] == 0.8
    # export.rs:136 — unknown/custom types map to Thing
    assert entity_type_to_schema_org("percentage") == "ratingValue"
    assert entity_type_to_schema_org("somethingCustom") == "Thing"


def test_entities_from_partition():
    pdf = build_sectioned_pdf(
        [("Intro", [["alpha", "beta", "gamma"]]),
         ("Methods", [["one", "two"], ["three", "four"]])]
    )
    emap = entities_from_partition(
        partition_pdf_bytes(pdf), {"source": "unit"}
    )
    kinds = [
        (e.entity_type, e.metadata.properties.get("content", ""))
        for p in sorted(emap.pages)
        for e in emap.pages[p]
    ]
    assert ("heading", "Intro") in kinds
    assert ("heading", "Methods") in kinds
    assert any(k == "paragraph" and "alpha beta gamma" in c for k, c in kinds)
    assert emap.document_metadata == {"source": "unit"}
    # ids are positional, stable across retries
    ids = [e.id for p in sorted(emap.pages) for e in emap.pages[p]]
    assert ids[0] == "entity_1" and len(set(ids)) == len(ids)
    # round-trips through both exports
    json.loads(emap.to_json())
    json.loads(emap.to_json_ld())


def test_redact_blackbox_and_placeholder():
    """semantic_redactor.rs:149 semantics, re-expressed: the covered
    text is actually REMOVED from extraction output (the reference only
    paints over it — documented quirk we do not reproduce)."""
    from oxidizepdf_spark.corpus import build_pdf_with_content_stream
    from oxidizepdf_spark.kernel.semantic import redact_extracted_text

    content = (
        b"BT /F1 12 Tf 100 700 Td (Name: John Smith) Tj "
        b"0 -40 Td (Total: 99 EUR) Tj ET"
    )
    pdf = build_pdf_with_content_stream(content)
    ents = [
        SemanticEntity("e1", "personName", BoundingBox(90.0, 690.0, 300.0, 24.0, 1)),
        SemanticEntity("e2", "amount", BoundingBox(90.0, 650.0, 300.0, 24.0, 1)),
    ]
    pages, rep = redact_extracted_text(pdf, ents, ["personName"])
    assert pages == ["Total: 99 EUR"]
    assert rep.redacted_count() == 1
    assert rep.pages_affected() == [1]
    assert rep.by_type("personName")[0].entity_id == "e1"

    pages2, rep2 = redact_extracted_text(
        pdf, ents, ["personName", "amount"], placeholder="[REDACTED]"
    )
    assert pages2 == ["[REDACTED]\n[REDACTED]"]
    assert rep2.redacted_count() == 2

    # empty entity_types redacts nothing (RedactionConfig default)
    pages3, rep3 = redact_extracted_text(pdf, ents, [])
    assert pages3 == ["Name: John Smith\nTotal: 99 EUR"]
    assert rep3.redacted_count() == 0

    # entity on a nonexistent page: no report entry, no effect
    ghost = [SemanticEntity("g", "amount", BoundingBox(0, 0, 999, 999, 7))]
    pages4, rep4 = redact_extracted_text(pdf, ghost, ["amount"])
    assert rep4.redacted_count() == 0 and pages4 == pages3

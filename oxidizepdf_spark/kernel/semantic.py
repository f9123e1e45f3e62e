"""Semantic marking for AI-Ready PDFs — entity model, marker API, and
EntityMap export (reference: oxidize-pdf-core/src/semantic/ — entity.rs,
marking.rs, export.rs, mod.rs).

The reference's marking half targets PDF *generation* (mark regions while
building a page); the read-side value is the entity model + export
formats, plus deriving entities FROM extraction — which the reference
gates to its PRO edition ("invoice detection, form field marking,
ML-ready exports", mod.rs:6-7).  Here ``entities_from_partition`` maps
the rich partitioner's elements (kernel/partition.py, element.rs parity)
into semantic entities so the JSON / JSON-LD exports carry real content.

Documented reference quirks:
  * marking.rs:57 EntityBuilder::build constructs the Entity, DROPS it
    (``let _entity``), and returns only the generated id — marked regions
    never reach export_entities in the community edition.  Our marker
    actually records into its EntityMap (deviation; the faithful no-op
    would make the whole module dead code).
  * marking.rs:105 uuid_simple() derives ids from the wall clock — ids
    here are deterministic per-marker counters (``entity_1``…) because
    Spark re-runs tasks and output must be stable across retries.
  * export.rs:75 iterates a HashMap when assembling JSON-LD hasPart —
    nondeterministic order; we sort by (page, insertion index).
  * EntityType serializes camelCase (serde rename_all) with Custom
    untagged (the bare string); RelationType::Custom is externally
    tagged ({"custom": value}) because it lacks the untagged attribute —
    both mirrored exactly.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

# entity.rs:87-168 EntityType variants, serde camelCase names
ENTITY_TYPES = {
    "text", "image", "table", "heading", "paragraph", "list", "pageNumber",
    "header", "footer",
    "invoice", "invoiceNumber", "customerName", "lineItem", "totalAmount",
    "taxAmount", "dueDate", "paymentAmount",
    "personName", "organizationName", "address", "phoneNumber", "email",
    "website",
    "contract", "contractParty", "contractTerm", "effectiveDate",
    "contractValue", "signature",
    "date", "amount", "quantity", "percentage",
}

RELATION_TYPES = {"contains", "isPartOf", "references", "follows", "precedes"}

# export.rs:97-137 entity_type_to_schema_org
_SCHEMA_ORG = {
    "invoice": "Invoice", "invoiceNumber": "identifier",
    "customerName": "customer", "totalAmount": "totalPrice",
    "taxAmount": "taxAmount", "dueDate": "paymentDueDate",
    "lineItem": "LineItem", "paymentAmount": "price",
    "personName": "Person", "organizationName": "Organization",
    "address": "PostalAddress", "phoneNumber": "telephone",
    "email": "email", "website": "url",
    "contract": "DigitalDocument", "contractParty": "Party",
    "contractTerm": "OfferCatalog", "effectiveDate": "datePublished",
    "contractValue": "price", "signature": "signatureValue",
    "heading": "Heading", "paragraph": "Paragraph", "table": "Table",
    "list": "ItemList", "image": "ImageObject", "text": "Text",
    "header": "WPHeader", "footer": "WPFooter", "pageNumber": "pageStart",
    "date": "Date", "amount": "MonetaryAmount", "quantity": "quantityValue",
    "percentage": "ratingValue",
}


def entity_type_to_schema_org(entity_type: str) -> str:
    """Custom (unknown) types map to 'Thing' (export.rs:136)."""
    return _SCHEMA_ORG.get(entity_type, "Thing")


@dataclass
class BoundingBox:
    """entity.rs:8 BoundingBox — PDF coordinates, 1-indexed page."""

    x: float
    y: float
    width: float
    height: float
    page: int

    def right(self) -> float:
        return self.x + self.width

    def top(self) -> float:
        return self.y + self.height

    def area(self) -> float:
        return self.width * self.height

    def intersects(self, other: "BoundingBox") -> bool:
        return (
            self.page == other.page
            and self.x < other.right()
            and self.right() > other.x
            and self.y < other.top()
            and self.top() > other.y
        )


@dataclass
class EntityMetadata:
    """entity.rs:171 — properties + clamped confidence + schema URL."""

    properties: dict = field(default_factory=dict)
    confidence: float | None = None
    schema: str | None = None

    def with_property(self, key: str, value: str) -> "EntityMetadata":
        self.properties[key] = value
        return self

    def with_confidence(self, confidence: float) -> "EntityMetadata":
        self.confidence = min(1.0, max(0.0, confidence))  # entity.rs clamp
        return self

    def with_schema(self, schema: str) -> "EntityMetadata":
        self.schema = schema
        return self

    def to_dict(self) -> dict:
        return {
            "properties": dict(sorted(self.properties.items())),
            "confidence": self.confidence,
            "schema": self.schema,
        }


@dataclass
class EntityRelation:
    """entity.rs:59 — relation_type is a camelCase string from
    RELATION_TYPES or any other string (Custom)."""

    target_id: str
    relation_type: str

    def to_dict(self) -> dict:
        rt = (
            self.relation_type
            if self.relation_type in RELATION_TYPES
            else {"custom": self.relation_type}  # externally-tagged Custom
        )
        return {"target_id": self.target_id, "relation_type": rt}


@dataclass
class Entity:
    """entity.rs:276 Entity — bounds is the (x, y, w, h) tuple form used
    by the marker/export path (page carried separately, 0-indexed)."""

    id: str
    entity_type: str
    bounds: tuple[float, float, float, float]
    page: int = 0
    metadata: EntityMetadata = field(default_factory=EntityMetadata)

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "type": self.entity_type,
            "bounds": list(self.bounds),
            "page": self.page,
            "metadata": self.metadata.to_dict(),
        }


@dataclass
class SemanticEntity:
    """entity.rs:233 SemanticEntity — the enhanced, relationship-bearing
    variant with a page-carrying BoundingBox and text content."""

    id: str
    entity_type: str
    bounds: BoundingBox
    content: str = ""
    metadata: EntityMetadata = field(default_factory=EntityMetadata)
    relationships: list = field(default_factory=list)

    def with_content(self, content: str) -> "SemanticEntity":
        self.content = content
        return self

    def with_relationship(self, target_id: str, relation_type: str) -> "SemanticEntity":
        self.relationships.append(EntityRelation(target_id, relation_type))
        return self

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "type": self.entity_type,
            "bounds": {
                "x": self.bounds.x, "y": self.bounds.y,
                "width": self.bounds.width, "height": self.bounds.height,
                "page": self.bounds.page,
            },
            "content": self.content,
            "metadata": self.metadata.to_dict(),
            "relationships": [r.to_dict() for r in self.relationships],
        }


class EntityMap:
    """export.rs:12 EntityMap — page-keyed entity collection with JSON,
    compact-JSON and JSON-LD (schema.org) exports."""

    def __init__(self) -> None:
        self.document_metadata: dict = {}
        self.pages: dict[int, list[Entity]] = {}
        self.schemas: list[str] = []

    def add_entity(self, entity: Entity) -> None:
        self.pages.setdefault(entity.page, []).append(entity)

    def entities_by_type(self, entity_type: str) -> list[Entity]:
        return [
            e
            for page in sorted(self.pages)
            for e in self.pages[page]
            if e.entity_type == entity_type
        ]

    def entities_on_page(self, page: int) -> list[Entity] | None:
        return self.pages.get(page)

    def _as_dict(self) -> dict:
        return {
            "document_metadata": dict(sorted(self.document_metadata.items())),
            "pages": {
                str(p): [e.to_dict() for e in self.pages[p]]
                for p in sorted(self.pages)
            },
            "schemas": list(self.schemas),
        }

    def to_json(self) -> str:
        """serde_json::to_string_pretty equivalent (2-space indent)."""
        return json.dumps(self._as_dict(), indent=2)

    def to_json_compact(self) -> str:
        return json.dumps(self._as_dict(), separators=(",", ":"))

    def to_json_ld(self) -> str:
        """export.rs:63 to_json_ld — schema.org DigitalDocument with one
        hasPart per entity (deterministic page order, unlike the
        reference's HashMap walk)."""
        parts = []
        for page_num in sorted(self.pages):
            for entity in self.pages[page_num]:
                parts.append(_entity_to_schema_org(entity, page_num))
        doc: dict = {
            "@context": "https://schema.org",
            "@type": "DigitalDocument",
            "additionalType": "AI-Ready PDF",
            "hasPart": parts,
        }
        if self.schemas:
            doc["conformsTo"] = list(self.schemas)
        for key, value in sorted(self.document_metadata.items()):
            doc[key] = value
        return json.dumps(doc, indent=2)


def _fmt_coord(v: float) -> str:
    """Rust {} float Display: integral values print without '.0'."""
    return f"{v:g}"


def _entity_to_schema_org(entity: Entity, page_num: int) -> dict:
    """export.rs:141 entity_to_schema_org."""
    out: dict = {
        "@type": entity_type_to_schema_org(entity.entity_type),
        "spatialCoverage": {
            "@type": "Place",
            "geo": {
                "@type": "GeoCoordinates",
                "box": ",".join(_fmt_coord(v) for v in entity.bounds),
            },
        },
        "pageStart": page_num + 1,
    }
    if entity.id:
        out["@id"] = entity.id
    for key, value in sorted(entity.metadata.properties.items()):
        out[key] = value
    if entity.metadata.confidence is not None:
        out["confidence"] = entity.metadata.confidence
    if entity.metadata.schema is not None:
        out["conformsTo"] = entity.metadata.schema
    return out


class EntityBuilder:
    """marking.rs:8 EntityBuilder — fluent metadata, build() returns the
    id.  Unlike marking.rs:57 (which drops the entity), build() records
    it on the owning marker's EntityMap."""

    def __init__(self, marker: "SemanticMarker", entity_type: str,
                 bounds: tuple, page: int) -> None:
        self._marker = marker
        self._entity_type = entity_type
        self._bounds = bounds
        self._page = page
        self._metadata = EntityMetadata()

    def with_metadata(self, key: str, value: str) -> "EntityBuilder":
        self._metadata.with_property(key, value)
        return self

    def with_confidence(self, confidence: float) -> "EntityBuilder":
        self._metadata.with_confidence(confidence)
        return self

    def with_schema(self, schema: str) -> "EntityBuilder":
        self._metadata.with_schema(schema)
        return self

    def build(self) -> str:
        self._marker._counter += 1
        eid = f"entity_{self._marker._counter:x}"  # deterministic ids
        entity = Entity(eid, self._entity_type, self._bounds, self._page,
                        self._metadata)
        self._marker.entity_map.add_entity(entity)
        return eid


class SemanticMarker:
    """marking.rs:66 SemanticMarker + mod.rs SemanticMarking trait:
    mark_region/mark_text/mark_image/mark_table + add_schema +
    export_entities, page-scoped via the ``page`` argument."""

    def __init__(self) -> None:
        self.entity_map = EntityMap()
        self._counter = 0

    def mark(self, entity_type: str, bounds: tuple, page: int = 0) -> EntityBuilder:
        return EntityBuilder(self, entity_type, bounds, page)

    def mark_region(self, bounds: tuple, page: int = 0) -> EntityBuilder:
        return self.mark("text", bounds, page)

    def mark_text(self, bounds: tuple, page: int = 0) -> EntityBuilder:
        return self.mark("text", bounds, page)

    def mark_image(self, bounds: tuple, page: int = 0) -> EntityBuilder:
        return self.mark("image", bounds, page)

    def mark_table(self, bounds: tuple, page: int = 0) -> EntityBuilder:
        return self.mark("table", bounds, page)

    def add_schema(self, schema_url: str) -> None:
        self.entity_map.schemas.append(schema_url)

    def export_entities(self) -> EntityMap:
        return self.entity_map


# mapping from partitioner kinds (element.rs type names) to EntityType
_KIND_TO_ENTITY = {
    "title": "heading",
    "paragraph": "paragraph",
    "table": "table",
    "header": "header",
    "footer": "footer",
    "list_item": "list",
    "image": "image",
    "code_block": "text",
    "key_value": "text",
}


def entities_from_partition(elements, document_metadata: dict | None = None) -> EntityMap:
    """Derive a populated EntityMap from rich partitioner output
    (kernel/partition.py RichElement list) — the read-side realization of
    the PRO-gated 'ML-ready exports' (semantic/mod.rs:6).  Entity ids are
    positional (stable across Spark task retries); bbox/confidence come
    from element metadata; table/key-value payloads land in properties."""
    emap = EntityMap()
    if document_metadata:
        emap.document_metadata.update(document_metadata)
    for i, el in enumerate(elements):
        meta = el.metadata
        bbox = meta.bbox
        entity = Entity(
            id=f"entity_{i + 1:x}",
            entity_type=_KIND_TO_ENTITY.get(el.kind, "text"),
            bounds=(bbox.x, bbox.y, bbox.width, bbox.height),
            page=meta.page,
            metadata=EntityMetadata(confidence=meta.confidence),
        )
        text = el.text  # property: '' for tables, alt text for images
        if text:
            entity.metadata.with_property("content", text)
        if el.kind == "key_value" and el.key is not None:
            entity.metadata.with_property("key", el.key)
            entity.metadata.with_property("value", el.value or "")
        if el.kind == "table" and el.rows:
            entity.metadata.with_property("rows", str(len(el.rows)))
            entity.metadata.with_property(
                "cols", str(max(len(r) for r in el.rows))
            )
        if meta.heading_path:
            entity.metadata.with_property(
                "headingPath", " > ".join(meta.heading_path)
            )
        emap.add_entity(entity)
    return emap


# ---------------------------------------------------------------------------
# semantic redaction (operations/semantic_redactor.rs — RAG-aligned PII
# removal before LLM ingestion)
# ---------------------------------------------------------------------------


@dataclass
class RedactionEntry:
    """semantic_redactor.rs:68 — one redacted entity occurrence."""

    entity_id: str
    entity_type: str
    page: int  # 1-indexed, like BoundingBox.page


class RedactionReport:
    """semantic_redactor.rs:79 RedactionReport."""

    def __init__(self, entries: list | None = None) -> None:
        self.entries = entries or []

    def redacted_count(self) -> int:
        return len(self.entries)

    def by_type(self, entity_type: str) -> list:
        return [e for e in self.entries if e.entity_type == entity_type]

    def pages_affected(self) -> list[int]:
        return sorted({e.page for e in self.entries})


def redact_extracted_text(
    data: bytes,
    entities: list,
    entity_types: list[str],
    placeholder: str | None = None,
    password: str | None = None,
) -> tuple[list[str], "RedactionReport"]:
    """SemanticRedactor::redact (semantic_redactor.rs:149), re-expressed
    for the extraction pipeline: instead of producing a new PDF, return
    per-page text with every fragment whose bbox intersects a selected
    entity's bounds REMOVED (BlackBox) or replaced by ``placeholder``.

    Reference quirk NOT reproduced: semantic_redactor.rs only draws an
    opaque rectangle over the region — the underlying text objects stay
    in the content stream, so text extraction (and any LLM ingesting the
    'redacted' PDF) still sees the sensitive content.  A corpus pipeline
    needs the text actually gone; that is what this does.

    Mirrored semantics: empty ``entity_types`` redacts nothing; the
    report carries one entry per selected entity whose page exists
    (the reference draws its box whether or not content sits under it);
    entity pages are 1-indexed."""
    from .extract import extract_pdf_bytes
    from .textstate import ExtractionOptions

    selected = (
        [e for e in entities if e.entity_type in entity_types]
        if entity_types
        else []
    )
    res = extract_pdf_bytes(
        data,
        ExtractionOptions(preserve_layout=True, password=password),
    )
    page_frag_lists = res.page_fragments or []
    if not selected:
        return [_frags_to_text(f) for f in page_frag_lists], RedactionReport()

    by_page: dict[int, list] = {}
    for e in selected:
        by_page.setdefault(e.bounds.page, []).append(e)

    entries = []
    out_pages: list[str] = []
    for idx, frags in enumerate(page_frag_lists):
        page_no = idx + 1
        page_entities = by_page.get(page_no, [])
        kept = []
        for f in frags:
            fb = BoundingBox(f.x, f.y, f.width, f.height, page_no)
            if any(en.bounds.intersects(fb) for en in page_entities):
                if placeholder is not None:
                    g = f.clone() if hasattr(f, "clone") else f
                    g.text = placeholder
                    g.width = 0.0
                    kept.append(g)
                continue
            kept.append(f)
        out_pages.append(_frags_to_text(kept))
    n_pages = len(page_frag_lists)
    for e in selected:
        if 1 <= e.bounds.page <= n_pages:
            entries.append(RedactionEntry(e.id, e.entity_type, e.bounds.page))
    return out_pages, RedactionReport(entries)


def _frags_to_text(frags) -> str:
    """Line-cluster reconstruction: fragments sharing a baseline (0.5pt
    tolerance) join with spaces, lines top-to-bottom with newlines."""
    if not frags:
        return ""
    rows: dict[float, list] = {}
    for f in frags:
        key = round(f.y * 2) / 2
        rows.setdefault(key, []).append(f)
    lines = []
    for y in sorted(rows, reverse=True):
        words = sorted(rows[y], key=lambda f: f.x)
        lines.append(" ".join(w.text for w in words if w.text))
    return "\n".join(lines)

"""Invoice field extraction — the reference's invoice vertical re-expressed
as rules over the engine's own keyvalue + layout output.

Reference: oxidize-pdf-core/src/text/invoice/ (~2.8k LoC: InvoiceData with
invoice_number/date/total/vendor fields populated by regex-keyed matching
over extracted key-value pairs and positioned text). This implementation is
deliberately the thin composition the reference's module reduces to once
keyvalue detection (kernel/structured.py), table detection
(kernel/tables.py), and OCR (ExtractionOptions.ocr_provider) exist as
shared operators: pattern-keyed field lookup over detect_key_value_pairs,
vendor = first non-keyvalue line in reading order.
"""

from __future__ import annotations

import re

from .extract import extract_pdf_bytes
from .structured import detect_key_value_pairs
from .textstate import ExtractionOptions

# field-key patterns (text/invoice field matchers: invoice number, issue
# date, grand total; case-insensitive, optional qualifiers)
_INVOICE_NO_KEY = re.compile(r"invoice\s*(number|no\.?|num|#)?", re.I)
_DATE_KEY = re.compile(r"(invoice\s+|issue\s+)?date", re.I)
_TOTAL_KEY = re.compile(r"(grand\s+)?total(\s+due)?|amount(\s+due)?", re.I)


class InvoiceData:
    __slots__ = ("invoice_number", "invoice_date", "total", "vendor", "n_pairs")

    def __init__(self):
        self.invoice_number: str | None = None
        self.invoice_date: str | None = None
        self.total: str | None = None
        self.vendor: str | None = None
        self.n_pairs = 0


def extract_invoice(data: bytes, password: str | None = None) -> InvoiceData:
    """Field extraction: layout fragments → key-value pairs → pattern-keyed
    assignment (first match wins, mirroring the reference's field
    priority); vendor is the first colon-less line in document order."""
    res = extract_pdf_bytes(
        data, ExtractionOptions(preserve_layout=True, password=password)
    )
    inv = InvoiceData()
    frags = [f for page in res.page_fragments for f in page]
    pairs = detect_key_value_pairs(frags)
    inv.n_pairs = len(pairs)
    for p in pairs:
        key = p.key.strip()
        if inv.invoice_number is None and _INVOICE_NO_KEY.fullmatch(key):
            inv.invoice_number = p.value
        elif inv.invoice_date is None and _DATE_KEY.fullmatch(key):
            inv.invoice_date = p.value
        elif inv.total is None and _TOTAL_KEY.fullmatch(key):
            inv.total = p.value
    for f in frags:
        text = f.text.strip()
        if text and ":" not in text:
            inv.vendor = text
            break
    return inv

"""OCR-text validation and search utilities.

Behavioral parity target: the reference's text/validation.rs
(TextValidator, TextValidationResult, TextMatch, MatchType,
calculate_string_similarity) — the post-OCR probe that checks whether
expected key elements (dates, contract numbers, party names, monetary
amounts) survived recognition, and scores the result.

Reference quirks preserved:
- Every default pattern is compiled case-insensitively (validation.rs
  wraps each in ``(?i)``) — including the party-name pattern, whose
  ``[A-Z]`` classes therefore match lowercase too.
- ``search_for_target`` finds case-insensitive occurrences but scores
  each with a positional character-similarity between the lowercased
  target and the lowercased slice (1.0 for case-insensitive-equal).
- ``validate_contract_text`` classifies contract-pattern hits by
  content: '$' → MonetaryAmount, 'agreement'/'contract' →
  ContractNumber, else PartyName; dates score 0.9, the rest 0.8, and
  the overall confidence is the plain mean.
- Positions are reported in characters (the Rust original reports UTF-8
  byte offsets; identical for ASCII text, which is what OCR output is
  scored on here).
"""

from __future__ import annotations

import re

# MatchType (validation.rs:39-46); Custom(s) is represented as the string
DATE = "date"
CONTRACT_NUMBER = "contract_number"
PARTY_NAME = "party_name"
MONETARY_AMOUNT = "monetary_amount"
LOCATION = "location"

_MONTHS = (
    "January|February|March|April|May|June|July|August|September|"
    "October|November|December"
)

_DATE_PATTERNS = [
    # "30 September 2016"
    rf"\b\d{{1,2}}\s+(?:{_MONTHS})\s+\d{{4}}\b",
    # "September 30, 2016"
    rf"\b(?:{_MONTHS})\s+\d{{1,2}},?\s+\d{{4}}\b",
    # "30/09/2016", "09-30-2016"
    r"\b\d{1,2}[\/\-]\d{1,2}[\/\-]\d{4}\b",
    # "2016-09-30"
    r"\b\d{4}[\/\-]\d{1,2}[\/\-]\d{1,2}\b",
]

_CONTRACT_PATTERNS = [
    # agreement / contract numbers
    r"\b(?:Agreement|Contract)\s+(?:No\.?|Number)?\s*:?\s*([A-Z0-9\-\/]+)",
    # party names (org suffixes)
    r"\b([A-Z][A-Za-z\s&,\.]+(?:LLC|Ltd|Corp|Corporation|Inc|Company|Co\.)\b)",
    # monetary amounts
    r"\$\s*[\d,]+(?:\.\d{2})?(?:\s*(?:million|thousand|M|K))?",
]

_MONEY_RE = re.compile(
    r"\$\s*[\d,]+(?:\.\d{2})?(?:\s*(?:million|thousand|M|K))?"
)
_ORG_RE = re.compile(
    r"\b([A-Z][A-Za-z\s&,\.]+(?:LLC|Ltd|Corp|Corporation|Inc|Company|Co\.)\b)"
)


class TextMatch:
    """validation.rs:24-36."""

    __slots__ = ("text", "position", "length", "confidence", "match_type")

    def __init__(self, text, position, length, confidence, match_type):
        self.text = text
        self.position = position
        self.length = length
        self.confidence = confidence
        self.match_type = match_type


class TextValidationResult:
    """validation.rs:9-21."""

    __slots__ = ("found", "matches", "confidence", "metadata")

    def __init__(self, found, matches, confidence, metadata):
        self.found = found
        self.matches = matches
        self.confidence = confidence
        self.metadata = metadata


def calculate_string_similarity(s1: str, s2: str) -> float:
    """validation.rs:286-313: positional char matches / max length."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    max_len = max(len(s1), len(s2))
    matches = sum(1 for a, b in zip(s1, s2) if a == b)
    return matches / max_len


class TextValidator:
    """validation.rs:49-263."""

    def __init__(self):
        self.date_patterns = [
            re.compile(p, re.IGNORECASE) for p in _DATE_PATTERNS
        ]
        self.contract_patterns = [
            re.compile(p, re.IGNORECASE) for p in _CONTRACT_PATTERNS
        ]
        self.custom_patterns: dict[str, re.Pattern] = {}

    def search_for_target(self, text: str, target: str) -> TextValidationResult:
        """validation.rs:111-151: all case-insensitive occurrences,
        each scored by positional similarity of the lowercased strings,
        overlapping starts allowed (the scan advances by ONE char)."""
        target_lower = target.lower()
        text_lower = text.lower()
        matches = []
        position = 0
        while True:
            found = text_lower.find(target_lower, position)
            if found == -1:
                break
            actual_text = text[found:found + len(target)]
            matches.append(
                TextMatch(
                    actual_text,
                    found,
                    len(target),
                    calculate_string_similarity(
                        target_lower, text_lower[found:found + len(target)]
                    ),
                    "target_search",
                )
            )
            position = found + 1
        confidence = (
            sum(m.confidence for m in matches) / len(matches) if matches else 0.0
        )
        return TextValidationResult(bool(matches), matches, confidence, {})

    def validate_contract_text(self, text: str) -> TextValidationResult:
        """validation.rs:154-212."""
        all_matches = []
        for pattern in self.date_patterns:
            for mat in pattern.finditer(text):
                all_matches.append(
                    TextMatch(mat.group(0), mat.start(), len(mat.group(0)),
                              0.9, DATE)
                )
        for pattern in self.contract_patterns:
            for mat in pattern.finditer(text):
                match_text = mat.group(0)
                if "$" in match_text:
                    match_type = MONETARY_AMOUNT
                elif (
                    "agreement" in match_text.lower()
                    or "contract" in match_text.lower()
                ):
                    match_type = CONTRACT_NUMBER
                else:
                    match_type = PARTY_NAME
                all_matches.append(
                    TextMatch(match_text, mat.start(), len(match_text),
                              0.8, match_type)
                )
        confidence = (
            sum(m.confidence for m in all_matches) / len(all_matches)
            if all_matches
            else 0.0
        )
        metadata = {
            "total_matches": str(len(all_matches)),
            "text_length": str(len(text)),
            "date_matches": str(
                sum(1 for m in all_matches if m.match_type == DATE)
            ),
        }
        return TextValidationResult(
            bool(all_matches), all_matches, confidence, metadata
        )

    def extract_key_info(self, text: str) -> dict[str, list[str]]:
        """validation.rs:215-256: dates / monetary_amounts /
        organizations, each key present only when non-empty."""
        extracted: dict[str, list[str]] = {}
        dates = [
            mat.group(0)
            for pattern in self.date_patterns
            for mat in pattern.finditer(text)
        ]
        if dates:
            extracted["dates"] = dates
        amounts = [m.group(0) for m in _MONEY_RE.finditer(text)]
        if amounts:
            extracted["monetary_amounts"] = amounts
        orgs = [m.group(0) for m in _ORG_RE.finditer(text)]
        if orgs:
            extracted["organizations"] = orgs
        return extracted

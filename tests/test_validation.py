"""OCR text validation/search (kernel/validation.py).

Parity target: text/validation.rs — its unit tests are mirrored and the
classification/scoring quirks pinned."""

from __future__ import annotations

import pytest

from oxidizepdf_spark.kernel.validation import (
    CONTRACT_NUMBER,
    DATE,
    MONETARY_AMOUNT,
    PARTY_NAME,
    TextValidator,
    calculate_string_similarity,
)


def test_date_validation():
    v = TextValidator()
    text = (
        "This agreement was signed on 30 September 2016 and expires on "
        "December 31, 2020."
    )
    result = v.validate_contract_text(text)
    assert result.found
    dates = [m for m in result.matches if m.match_type == DATE]
    assert len(dates) >= 2
    assert any(m.text == "30 September 2016" for m in dates)
    assert any(m.text == "December 31, 2020" for m in dates)
    assert all(m.confidence == 0.9 for m in dates)
    assert result.metadata["date_matches"] == str(len(dates))


def test_numeric_date_formats():
    v = TextValidator()
    r = v.validate_contract_text("Due 30/09/2016 and again 2016-09-30.")
    dates = [m.text for m in r.matches if m.match_type == DATE]
    assert "30/09/2016" in dates and "2016-09-30" in dates


def test_target_search():
    v = TextValidator()
    text = "The contract was executed on 30 September 2016 by both parties."
    result = v.search_for_target(text, "30 September 2016")
    assert result.found
    assert len(result.matches) == 1
    assert result.matches[0].text == "30 September 2016"
    assert result.matches[0].confidence == 1.0
    assert result.matches[0].position == text.index("30 September")
    assert result.matches[0].match_type == "target_search"


def test_target_search_case_insensitive_similarity():
    v = TextValidator()
    # found case-insensitively; similarity compares LOWERCASED strings,
    # so a pure case difference still scores 1.0
    r = v.search_for_target("SIGNED BY ACME TODAY", "acme")
    assert r.found and r.matches[0].text == "ACME"
    assert r.matches[0].confidence == 1.0
    miss = v.search_for_target("nothing here", "absent")
    assert not miss.found and miss.confidence == 0.0 and miss.matches == []


def test_target_search_overlapping():
    v = TextValidator()
    r = v.search_for_target("aaaa", "aa")
    # scan advances one char per hit → 3 overlapping matches
    assert [m.position for m in r.matches] == [0, 1, 2]


def test_match_classification():
    v = TextValidator()
    text = "Agreement No: AB-12 between ABC Corp for $1,000,000.00 total."
    r = v.validate_contract_text(text)
    types = {m.match_type for m in r.matches}
    assert CONTRACT_NUMBER in types
    assert PARTY_NAME in types
    assert MONETARY_AMOUNT in types
    money = next(m for m in r.matches if m.match_type == MONETARY_AMOUNT)
    assert money.text == "$1,000,000.00"
    assert money.confidence == 0.8


def test_overall_confidence_mean():
    v = TextValidator()
    r = v.validate_contract_text("Signed 30 September 2016 for $5,000.")
    per = [m.confidence for m in r.matches]
    assert r.confidence == pytest.approx(sum(per) / len(per))
    empty = v.validate_contract_text("nothing of note")
    assert not empty.found and empty.confidence == 0.0


def test_key_info_extraction():
    v = TextValidator()
    text = (
        "Agreement between ABC Corp and XYZ LLC for $1,000,000 signed on "
        "30 September 2016."
    )
    info = v.extract_key_info(text)
    assert "dates" in info and "30 September 2016" in info["dates"]
    assert info["monetary_amounts"] == ["$1,000,000"]
    assert any("ABC Corp" in o for o in info["organizations"])
    assert v.extract_key_info("plain words only") == {}


def test_string_similarity():
    assert calculate_string_similarity("abc", "abc") == 1.0
    assert calculate_string_similarity("", "abc") == 0.0
    assert calculate_string_similarity("abcd", "abXd") == 0.75
    # positional: same chars shifted score poorly
    assert calculate_string_similarity("ab", "ba") == 0.0

#!/usr/bin/env python3
"""Derive the Adobe-CNS1 (Traditional Chinese) CID→Unicode table.

Unlike GB1/Japan1/Korea1 (tools/gen_cid_unicode.py), no CNS1 encoding CMap
(B5pc-H / ETen-B5-H) is available offline to compose with Python's big5
codec, so the code→CID leg can't be rebuilt locally. The CID→Unicode FACTS
are Adobe's own BSD-licensed cid2code.txt data; this script extracts that
DATA (never code) from its nearest offline materialization — the
MIT-licensed reference repo's vendored static table
(oxidize-pdf-core/src/text/cid_to_unicode.rs, "Adobe-CNS1 CID → Unicode
mapping") — and re-serializes it into this engine's compact format after
independent sanity cross-checks:

1. every codepoint is a valid Unicode scalar;
2. the low-CID band is the printable-ASCII/latin region Adobe assigns
   first in every CJK collection (spot-checked: CID 2 = '!', CID 17='0');
3. the CJK repertoire is overwhelmingly big5-encodable (Python's bundled
   big5 codec, round-trip check) — Adobe-CNS1's base planes ARE Big5;
4. well-known anchor characters are present (一 中 國 臺 灣).

Usage: python tools/gen_cns1_table.py [cid_to_unicode.rs path]
Writes: oxidizepdf_spark/kernel/data/cid_unicode_cns1.txt.gz
"""

from __future__ import annotations

import gzip
import os
import re
import sys
import unicodedata

PAIR = re.compile(r"\((\d+),\s*0x([0-9A-Fa-f]+)\)")


def _b5code(cp: int) -> int | None:
    """2-byte big5hkscs code of a codepoint, or None."""
    try:
        b = chr(cp).encode("big5hkscs")
        return int.from_bytes(b, "big") if len(b) == 2 else None
    except UnicodeError:
        return None


def _b5decode(code: int) -> str | None:
    try:
        s = code.to_bytes(2, "big").decode("big5hkscs")
        return s if len(s) == 1 else None
    except UnicodeError:
        return None


_RADICAL = (0x2E80, 0x2FDF)  # CJK Radicals Supplement + Kangxi Radicals


def repair_radicals(table: dict[int, int]) -> int:
    """The vendored source table maps some ideograph CIDs to Kangxi
    RADICAL lookalikes (e.g. CID 595 → U+2F00 ⼀ where Adobe-CNS1
    assigns U+4E00 一 — the first Big5 ideograph, code 0xA440; its
    neighbors CID 596 ⼄→乙 0xA441 and CID 597 丁 0xA442 pin the
    intended Big5 code order). NFKC of a Kangxi radical IS its
    canonical unified ideograph (public Unicode data), so repair each
    radical-valued entry whose NFKC ideograph's big5hkscs code fits
    strictly between the nearest non-radical neighbors' codes — the
    same code-order cross-validation sanity() applies to the rest of
    the table. Entries that fail the bracket check (genuine radical
    CIDs in the supplement planes) are left untouched."""
    cids = sorted(table)

    def nearest(i: int, step: int) -> int | None:
        while 0 <= i < len(cids):
            v = table[cids[i]]
            if not (_RADICAL[0] <= v <= _RADICAL[1]):
                return _b5code(v)  # None = unconstrained on this side
            i += step
        return None

    fixed = 0
    for idx, c in enumerate(cids):
        v = table[c]
        if not (_RADICAL[0] <= v <= _RADICAL[1]):
            continue
        n = unicodedata.normalize("NFKC", chr(v))
        if len(n) != 1 or n == chr(v):
            continue
        nb = _b5code(ord(n))
        if nb is None:
            continue
        lo = nearest(idx - 1, -1)
        hi = nearest(idx + 1, 1)
        if (lo is None or lo < nb) and (hi is None or nb < hi):
            table[c] = ord(n)
            fixed += 1
    return fixed


def fill_gaps(table: dict[int, int]) -> int:
    """Adobe-CNS1's base planes are Big5(+HKSCS) in code order, so a
    missing CID run between two mapped CIDs is recoverable whenever the
    number of VALID big5hkscs codes strictly between the endpoints'
    codes equals the run length — a self-validating interpolation: any
    ordering break (plane boundary, non-Big5 supplement region) makes
    the counts mismatch and the run is skipped. Runs the count on the
    radical-repaired table (repair first: corrected endpoints brake
    fewer runs)."""
    cids = sorted(table)
    filled = 0
    for a, b in zip(cids, cids[1:]):
        gap = b - a - 1
        if gap <= 0:
            continue
        b1 = _b5code(table[a])
        b2 = _b5code(table[b])
        if b1 is None or b2 is None or b2 <= b1:
            continue
        mids = [
            ch
            for code in range(b1 + 1, b2)
            if (ch := _b5decode(code)) is not None
        ]
        if len(mids) == gap:
            for k, ch in enumerate(mids):
                table[a + 1 + k] = ord(ch)
            filled += gap
    return filled


def extract_cns1(rs_path: str) -> dict[int, int]:
    src = open(rs_path, "r", encoding="utf-8").read()
    m = re.search(
        r"CNS1_CID_TO_UNICODE[^=]*=\s*\[(.*?)\];", src, re.S
    )
    if not m:
        raise SystemExit("CNS1 table not found in " + rs_path)
    table: dict[int, int] = {}
    for cid_s, cp_s in PAIR.findall(m.group(1)):
        table[int(cid_s)] = int(cp_s, 16)
    return table


def sanity(table: dict[int, int]) -> None:
    assert len(table) > 10_000, f"suspiciously small: {len(table)}"
    for cid, cp in table.items():
        assert 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF), (cid, cp)
    # Adobe CJK collections open with the latin repertoire
    assert chr(table[2]) == "!" and chr(table[17]) == "0", "latin band off"
    # anchors every Traditional-Chinese document uses. 一 (U+4E00) was
    # absent from the raw source's 16,950 entries (CID 595 carried the
    # Kangxi-radical lookalike U+2F00); repair_radicals restores it, so
    # it is an anchor now.
    cps = set(table.values())
    for ch in "一中國臺灣台文字語":
        assert ord(ch) in cps, f"missing anchor {ch!r}"
    assert table.get(595) == 0x4E00, "CID 595 must be 一 after repair"
    # Big5+HKSCS coverage: Adobe-CNS1's planes are Big5 plus the Hong Kong
    # supplement — Python's big5hkscs codec round-trips 99.5% of the CJK
    # repertoire (plain big5: 85%, the rest being HKSCS extensions)
    cjk = [cp for cp in cps if 0x4E00 <= cp <= 0x9FFF]
    ok = sum(1 for cp in cjk if _big5_roundtrips(chr(cp)))
    assert ok / max(len(cjk), 1) > 0.95, f"big5hkscs coverage {ok}/{len(cjk)}"
    print(
        f"sanity ok: {len(table)} entries, {len(cjk)} CJK, "
        f"big5hkscs-encodable {ok} ({ok / max(len(cjk), 1):.1%})"
    )


def _big5_roundtrips(ch: str) -> bool:
    try:
        return ch.encode("big5hkscs").decode("big5hkscs") == ch
    except UnicodeError:
        return False


def main() -> None:
    rs = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/oxidize-pdf-core/src/text/cid_to_unicode.rs"
    )
    table = extract_cns1(rs)
    n_fix = repair_radicals(table)
    n_fill = fill_gaps(table)
    print(f"repaired {n_fix} radical lookalikes, gap-filled {n_fill} CIDs")
    sanity(table)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "oxidizepdf_spark", "kernel", "data", "cid_unicode_cns1.txt.gz",
    )
    with gzip.open(out, "wt") as f:
        f.write(
            "# CID->Unicode for Adobe-CNS1 (Traditional Chinese).\n"
            "# Source data: Adobe cid2code.txt facts (c) Adobe,\n"
            "# BSD-3-Clause (github.com/adobe-type-tools/cid2code),\n"
            "# extracted by tools/gen_cns1_table.py from their vendored\n"
            "# materialization in the MIT-licensed reference repo and\n"
            "# cross-checked against Python's big5hkscs codec. The raw\n"
            "# source covers 16,950 of ~19,178 Adobe-CNS1 CIDs and maps\n"
            "# some ideograph CIDs to Kangxi-radical lookalikes (e.g.\n"
            "# CID 595 carried U+2F00 instead of U+4E00); this table is\n"
            "# repaired via NFKC (radical -> canonical ideograph, public\n"
            "# Unicode data) and gap-filled by big5hkscs code-order\n"
            "# interpolation, both only where the code-order bracket /\n"
            "# count cross-validation passes (see repair_radicals and\n"
            "# fill_gaps in the generator). Remaining unmapped CIDs\n"
            "# decode to U+FFFD like the reference on the same CIDs.\n"
        )
        for cid in sorted(table):
            f.write(f"{cid} {table[cid]}\n")
    print(f"CNS1: {len(table)} entries -> {out}")


if __name__ == "__main__":
    main()

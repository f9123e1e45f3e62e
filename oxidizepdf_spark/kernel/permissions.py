"""PDF permission flags (ISO 32000-1 §7.6.3.2 Table 22).

Behavioral parity target: the reference's encryption/permissions.rs
(Permissions, PermissionFlags) — the /P bit tests a corpus pipeline
uses to decide whether an encrypted document's text may be copied /
extracted, plus the constructors the reference exposes:

- ``Permissions()`` starts from 0xFFFFF0C0 (bits 1-2 zero, reserved
  bits 7-8 and 13-32 set, all permission bits cleared —
  permissions.rs:46-52).
- ``Permissions.all()`` ORs in 0x0F3C (permissions.rs:86-91).
- bit positions: print=3, modify_contents=4, copy=5,
  modify_annotations=6, fill_forms=9, accessibility=10, assemble=11,
  print_high_quality=12 (1-based as in the spec table).

``document_permissions`` reads the trailer /Encrypt /P through the
engine's reader (the handler already normalizes the signed/unsigned
encodings PDF writers disagree on) and returns None for unencrypted
documents, where everything is implicitly allowed.
"""

from __future__ import annotations

_BASE = 0xFFFFF0C0  # permissions.rs:50
_ALL = 0x0F3C  # permissions.rs:89

_BITS = {
    "print": 1 << 2,
    "modify_contents": 1 << 3,
    "copy": 1 << 4,
    "modify_annotations": 1 << 5,
    "fill_forms": 1 << 8,
    "accessibility": 1 << 9,
    "assemble": 1 << 10,
    "print_high_quality": 1 << 11,
}


class Permissions:
    """permissions.rs Permissions over the 32-bit /P value."""

    __slots__ = ("bits",)

    def __init__(self, bits: int = _BASE):
        self.bits = bits & 0xFFFFFFFF

    @classmethod
    def new(cls) -> "Permissions":
        return cls(_BASE)

    @classmethod
    def all(cls) -> "Permissions":
        return cls(_BASE | _ALL)

    @classmethod
    def from_bits(cls, bits: int) -> "Permissions":
        return cls(bits)

    @classmethod
    def from_flags(cls, **flags) -> "Permissions":
        """permissions.rs from_flags: keyword names match _BITS keys."""
        p = cls(_BASE)
        for name, allow in flags.items():
            p.set(name, allow)
        return p

    def set(self, name: str, allow: bool) -> "Permissions":
        bit = _BITS[name]
        if allow:
            self.bits |= bit
        else:
            self.bits &= ~bit & 0xFFFFFFFF
        return self

    def can(self, name: str) -> bool:
        return (self.bits & _BITS[name]) != 0

    # the reference's named accessors
    def can_print(self) -> bool:
        return self.can("print")

    def can_modify_contents(self) -> bool:
        return self.can("modify_contents")

    def can_copy(self) -> bool:
        return self.can("copy")

    def can_modify_annotations(self) -> bool:
        return self.can("modify_annotations")

    def can_fill_forms(self) -> bool:
        return self.can("fill_forms")

    def can_access_for_accessibility(self) -> bool:
        return self.can("accessibility")

    def can_assemble(self) -> bool:
        return self.can("assemble")

    def can_print_high_quality(self) -> bool:
        return self.can("print_high_quality")

    def contains(self, other: "Permissions") -> bool:
        """permissions.rs:104-106."""
        return (self.bits & other.bits) == other.bits

    def flags(self) -> dict:
        """All eight named flags as a dict (PermissionFlags analogue)."""
        return {name: self.can(name) for name in _BITS}


def document_permissions(data: bytes, password=None):
    """Trailer /Encrypt /P → Permissions; None when unencrypted."""
    from .reader import PdfReader

    reader = PdfReader(data, password=password)
    handler = getattr(reader, "decryptor", None)
    if handler is None:
        return None
    return Permissions.from_bits(handler.p)

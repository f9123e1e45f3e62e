"""Standard security handler: empty-user-password decryption.

Reimplements the reference's parser/encryption_handler.rs (key derivation,
try_empty_password:482, decrypt_string:500, decrypt_stream:517) and the
primitives in src/encryption/ (rc4.rs, aes.rs, standard_security.rs) from
the public ISO 32000 algorithms:

- Algorithm 2   (R2-R4 key derivation, MD5 based)
- Algorithm 4/5 (user-password validation via the U entry)
- Algorithm 1   (per-object key: MD5(key + num3 + gen2 [+ sAlT]))
- Algorithm 2.A/2.B (R5/R6 SHA-2 validation + hardened hash)
- RC4 and AES-CBC (AES decryption is numpy-vectorized across blocks —
  CBC decryption is embarrassingly parallel: P_i = D(C_i) xor C_{i-1} —
  so bulk stream decryption runs at table-lookup speed, not per-byte
  Python speed; encryption is only needed inside the 2.B KDF and uses a
  scalar T-table implementation)

Scope mirrors the round-2 plan: EMPTY user password only (the common
"encrypted but openable" corpus case). Password-protected documents keep
raising EncryptedPdfError upstream.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# RC4 (public algorithm; reference: src/encryption/rc4.rs)
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197) — tables
# ---------------------------------------------------------------------------


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse in GF(2^8) + affine transform
    p, q = 1, 1
    sbox = [0] * 256
    while True:
        # p *= 3
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q /= 3
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
        if p == 1:
            break
    sbox[0] = 0x63
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return sbox, inv


_SBOX_L, _INV_SBOX_L = _build_sbox()
_SBOX = np.array(_SBOX_L, dtype=np.uint8)
_INV_SBOX = np.array(_INV_SBOX_L, dtype=np.uint8)


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _gmul(a: int, b: int) -> int:
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        b >>= 1
        a = _xtime(a)
    return r


_T9 = np.array([_gmul(0x09, i) for i in range(256)], dtype=np.uint8)
_TB = np.array([_gmul(0x0B, i) for i in range(256)], dtype=np.uint8)
_TD = np.array([_gmul(0x0D, i) for i in range(256)], dtype=np.uint8)
_TE = np.array([_gmul(0x0E, i) for i in range(256)], dtype=np.uint8)
_T2 = [_gmul(2, i) for i in range(256)]
_T3 = [_gmul(3, i) for i in range(256)]

# state flat index = 4*col + row; InvShiftRows: s'[r][c] = s[r][(c - r) % 4]
_INV_SHIFT_IDX = np.array(
    [4 * ((c - r) % 4) + r for c in range(4) for r in range(4)], dtype=np.intp
)
# ShiftRows (forward): s'[r][c] = s[r][(c + r) % 4]
_SHIFT_IDX = [4 * ((c + r) % 4) + r for c in range(4) for r in range(4)]

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C]


def _expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 key expansion → list of (Nr+1) 16-byte round keys."""
    nk = len(key) // 4
    nr = {4: 10, 6: 12, 8: 14}[nk]
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX_L[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX_L[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [
        bytes(b for word in w[4 * r : 4 * r + 4] for b in word)
        for r in range(nr + 1)
    ]


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    """Scalar forward cipher — used only inside the R6 2.B KDF."""
    s = [b ^ k for b, k in zip(block, rks[0])]
    nr = len(rks) - 1
    for rnd in range(1, nr):
        s = [_SBOX_L[s[i]] for i in _SHIFT_IDX]
        rk = rks[rnd]
        ns = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            ns[4 * c] = _T2[a0] ^ _T3[a1] ^ a2 ^ a3 ^ rk[4 * c]
            ns[4 * c + 1] = a0 ^ _T2[a1] ^ _T3[a2] ^ a3 ^ rk[4 * c + 1]
            ns[4 * c + 2] = a0 ^ a1 ^ _T2[a2] ^ _T3[a3] ^ rk[4 * c + 2]
            ns[4 * c + 3] = _T3[a0] ^ a1 ^ a2 ^ _T2[a3] ^ rk[4 * c + 3]
        s = ns
    rk = rks[nr]
    return bytes(_SBOX_L[s[i]] ^ rk[j] for j, i in enumerate(_SHIFT_IDX))


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt without padding (data length must be a block multiple).
    Sequential by nature; only the 2.B KDF uses it."""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


def _decrypt_blocks(ct: np.ndarray, rks: list[bytes]) -> np.ndarray:
    """Vectorized inverse cipher over (N, 16) uint8 blocks."""
    nr = len(rks) - 1
    rk_arrays = [np.frombuffer(k, dtype=np.uint8) for k in rks]
    s = ct ^ rk_arrays[nr]
    for rnd in range(nr - 1, 0, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT_IDX]]
        s ^= rk_arrays[rnd]
        # InvMixColumns, all blocks/columns at once
        v = s.reshape(-1, 4, 4)  # [block, col, row]
        a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
        s = np.stack(
            [
                _TE[a0] ^ _TB[a1] ^ _TD[a2] ^ _T9[a3],
                _T9[a0] ^ _TE[a1] ^ _TB[a2] ^ _TD[a3],
                _TD[a0] ^ _T9[a1] ^ _TE[a2] ^ _TB[a3],
                _TB[a0] ^ _TD[a1] ^ _T9[a2] ^ _TE[a3],
            ],
            axis=2,
        ).reshape(-1, 16)
    s = _INV_SBOX[s[:, _INV_SHIFT_IDX]]
    s ^= rk_arrays[0]
    return s


def aes_cbc_decrypt(key: bytes, data: bytes, strip_pad: bool = True) -> bytes:
    """Decrypt ``IV || ciphertext`` (the PDF stream layout for AESV2/V3).
    CBC decryption is block-parallel: P_i = D(C_i) ^ C_{i-1}."""
    if len(data) == 16:
        # IV only — legal encoding of zero-block (empty) plaintext
        return b""
    if len(data) < 32 or len(data) % 16:
        # too short / misaligned — tolerate by collapsing to empty (the
        # reference's lenient path likewise never raises on malformed
        # stream ciphertext)
        return b""
    iv, ct = data[:16], data[16:]
    blocks = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 16)
    plain = _decrypt_blocks(blocks, _expand_key(key))
    prev = np.frombuffer(iv + ct[:-16], dtype=np.uint8).reshape(-1, 16)
    out = (plain ^ prev).tobytes()
    if strip_pad and out:
        pad = out[-1]
        if 1 <= pad <= 16 and pad <= len(out):
            out = out[:-pad]
    return out


def aes_cbc_decrypt_zero_iv_nopad(key: bytes, data: bytes) -> bytes:
    """AES-256-CBC, zero IV, no padding — the UE/OE file-key unwrap."""
    if not data or len(data) % 16:
        return b""
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    plain = _decrypt_blocks(blocks, _expand_key(key))
    prev = np.frombuffer(bytes(16) + data[:-16], dtype=np.uint8).reshape(-1, 16)
    return (plain ^ prev).tobytes()


# ---------------------------------------------------------------------------
# standard security handler (ISO 32000 §7.6.3; encryption_handler.rs)
# ---------------------------------------------------------------------------

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
        0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
        0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B hardened hash (R6; standard_security.rs)."""
    K = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        K1 = (password + K + udata) * 64
        E = aes_cbc_encrypt_nopad(K[:16], K[16:32], K1)
        mod = sum(E[:16]) % 3
        if mod == 0:
            K = hashlib.sha256(E).digest()
        elif mod == 1:
            K = hashlib.sha384(E).digest()
        else:
            K = hashlib.sha512(E).digest()
        i += 1
        if i >= 64 and E[-1] <= i - 32:
            break
    return K[:32]


# -- fixture-side entry computation (Algorithms 3/4/5 forward direction) ----
# Used by corpus.py to synthesize encrypted test PDFs; the parse path above
# never calls these.


def compute_o_r2_r4(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the O (owner) entry."""
    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            # spec: each round hashes the FIRST n BYTES of the previous
            # output (matters for 40-bit keys where n=5 < 16)
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    o = rc4(key, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u_r2_r4(key: bytes, r: int, file_id: bytes) -> bytes:
    """Algorithms 4 (R2) / 5 (R3+): the U (user) entry."""
    if r == 2:
        return rc4(key, _PAD)
    h = hashlib.md5(_PAD + file_id).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + bytes(16)


class StandardSecurityHandler:
    """Parsed /Encrypt dict + (on successful auth) live decryptor.

    ``try_empty_password()`` mirrors encryption_handler.rs:482; per-object
    decryption mirrors decrypt_string/decrypt_stream (:500, :517)."""

    __slots__ = (
        "v", "r", "length", "o", "u", "oe", "ue", "p", "file_id",
        "encrypt_metadata", "stm_cfm", "str_cfm", "key", "unlocked",
    )

    def __init__(self, enc: dict, file_id: bytes | None):
        def _i(x, default=0):
            return x if isinstance(x, int) else default

        self.v = _i(enc.get("V"), 0)
        self.r = _i(enc.get("R"), 2)
        self.length = _i(enc.get("Length"), 40)
        self.o = bytes(enc.get("O") or b"")
        self.u = bytes(enc.get("U") or b"")
        self.oe = bytes(enc.get("OE") or b"")
        self.ue = bytes(enc.get("UE") or b"")
        p = _i(enc.get("P"), -1)
        self.p = p & 0xFFFFFFFF  # normalize signed/unsigned encodings
        self.file_id = file_id or b""
        em = enc.get("EncryptMetadata")
        self.encrypt_metadata = em if isinstance(em, bool) else True
        # crypt filter methods (V4/V5); V1/V2 are implicitly RC4
        self.stm_cfm = "V2" if self.v in (1, 2) else None
        self.str_cfm = self.stm_cfm
        cf = enc.get("CF")
        if isinstance(cf, dict):
            def method(name):
                f = cf.get(str(name))
                if isinstance(f, dict):
                    return str(f.get("CFM", "Identity"))
                return "Identity"

            stmf = str(enc.get("StmF", "Identity"))
            strf = str(enc.get("StrF", "Identity"))
            self.stm_cfm = method(stmf) if stmf != "Identity" else "Identity"
            self.str_cfm = method(strf) if strf != "Identity" else "Identity"
        self.key: bytes | None = None
        self.unlocked = False

    # -- R2-R4 --------------------------------------------------------------

    def _derive_key_r2_r4(self, password: bytes) -> bytes:
        """Algorithm 2."""
        n = max(5, min(self.length // 8, 16))
        h = hashlib.md5()
        h.update((password + _PAD)[:32])
        h.update(self.o[:32])
        h.update(struct.pack("<I", self.p))
        h.update(self.file_id)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()[:n]
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key).digest()[:n]
        return key

    def _check_user_r2_r4(self, key: bytes) -> bool:
        """Algorithms 4 (R2) / 5 (R3+): recompute U and compare."""
        if self.r == 2:
            u = rc4(key, _PAD)
            return u == self.u[:32]
        h = hashlib.md5(_PAD + self.file_id).digest()
        u = rc4(key, h)
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in key), u)
        return u[:16] == self.u[:16]

    def _derive_owner_key_r2_r4(self, owner_pw: bytes) -> bytes:
        """Algorithm 3 steps a-d: the RC4 key that encrypts the O entry."""
        n = max(5, min(self.length // 8, 16))
        h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
        if self.r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:n]).digest()
        return h[:n]

    # -- R5/R6 --------------------------------------------------------------

    def _check_user_r5_r6(self, password: bytes) -> bytes | None:
        """Algorithm 2.A user validation; returns the file key or None."""
        if len(self.u) < 48 or len(self.ue) < 32:
            return None
        vsalt, ksalt = self.u[32:40], self.u[40:48]
        if self.r == 5:
            if hashlib.sha256(password + vsalt).digest() != self.u[:32]:
                return None
            ikey = hashlib.sha256(password + ksalt).digest()
        else:  # R6
            if _hash_2b(password, vsalt) != self.u[:32]:
                return None
            ikey = _hash_2b(password, ksalt)
        fkey = aes_cbc_decrypt_zero_iv_nopad(ikey, self.ue[:32])
        return fkey if len(fkey) == 32 else None

    def _check_owner_r5_r6(self, password: bytes) -> bytes | None:
        """Algorithm 2.A owner validation (salts from O, U[0:48] as extra
        hash data); returns the file key or None."""
        if len(self.o) < 48 or len(self.oe) < 32 or len(self.u) < 48:
            return None
        vsalt, ksalt = self.o[32:40], self.o[40:48]
        udata = self.u[:48]
        if self.r == 5:
            if hashlib.sha256(password + vsalt + udata).digest() != self.o[:32]:
                return None
            ikey = hashlib.sha256(password + ksalt + udata).digest()
        else:  # R6
            if _hash_2b(password, vsalt, udata) != self.o[:32]:
                return None
            ikey = _hash_2b(password, ksalt, udata)
        fkey = aes_cbc_decrypt_zero_iv_nopad(ikey, self.oe[:32])
        return fkey if len(fkey) == 32 else None

    # -- public -------------------------------------------------------------

    def prep_password(self, password: bytes | str) -> bytes:
        """Caller-supplied password → auth bytes: UTF-8 truncated to 127
        bytes for R5/R6 (ISO 32000-2 says SASLprep; UTF-8 covers the
        practical corpus), latin-1 for the legacy R2-R4 handlers
        (PDFDocEncoding ≈ latin-1 on the printable range)."""
        if isinstance(password, str):
            if self.r >= 5:
                return password.encode("utf-8")[:127]
            return password.encode("latin-1", "replace")
        return password[:127] if self.r >= 5 else password

    def try_empty_password(self) -> bool:
        """encryption_handler.rs:482 — the corpus-scale common case."""
        return self.try_password(b"")

    def try_password(self, password: bytes) -> bool:
        """Authenticate as user OR owner (PasswordProvider semantics,
        parser/mod.rs:167-169 + encryption_handler.rs authenticate): the
        user path validates directly; the owner path (Algorithm 7 for
        R2-R4, Algorithm 2.A owner branch for R5/R6) recovers the same
        file key, so either password fully unlocks extraction."""
        if self.unlocked:
            return True
        if self.r in (2, 3, 4):
            key = self._derive_key_r2_r4(password)
            if self._check_user_r2_r4(key):
                self.key = key
                self.unlocked = True
                return True
            # Algorithm 7: decrypt O with the owner key → padded user
            # password → authenticate as user ((pw + PAD)[:32] is a no-op
            # on the already-32-byte recovered value)
            okey = self._derive_owner_key_r2_r4(password)
            user_pw = self.o[:32]
            if self.r == 2:
                user_pw = rc4(okey, user_pw)
            else:
                for i in range(19, -1, -1):
                    user_pw = rc4(bytes(b ^ i for b in okey), user_pw)
            key = self._derive_key_r2_r4(user_pw)
            if self._check_user_r2_r4(key):
                self.key = key
                self.unlocked = True
        elif self.r in (5, 6):
            fkey = self._check_user_r5_r6(password)
            if fkey is None:
                fkey = self._check_owner_r5_r6(password)
            if fkey is not None:
                self.key = fkey
                self.unlocked = True
        return self.unlocked

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        """Algorithm 1 per-object key (not used for V5)."""
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if aes:
            h.update(b"sAlT")
        n = min(len(self.key) + 5, 16)
        return h.digest()[:n]

    def _decrypt(self, data: bytes, num: int, gen: int, cfm: str | None) -> bytes:
        if not self.unlocked or not data or cfm == "Identity":
            return data
        if self.v == 5:  # AESV3: the file key is used directly
            return aes_cbc_decrypt(self.key, data)
        if cfm == "AESV2":
            return aes_cbc_decrypt(self._object_key(num, gen, True), data)
        # V1/V2 and CFM V2 → RC4
        return rc4(self._object_key(num, gen, False), data)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._decrypt(data, num, gen, self.stm_cfm)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._decrypt(data, num, gen, self.str_cfm)


class PublicKeySecurityHandler(StandardSecurityHandler):
    """/Adobe.PubSec public-key (recipient) security handler, ISO
    32000-1 §7.6.5, SubFilter adbe.pkcs7.s3/s4/s5. BEYOND the
    reference: it ships encryption/public_key.rs but its reader
    (parser/encryption_handler.rs) never wires it, so recipient-
    encrypted documents error there.

    The caller supplies the recipient's RSA private key as (n, d);
    ``try_recipient_key`` walks the /Recipients envelopes, opens the
    first one the key decrypts, and derives the file encryption key per
    §7.6.5.3: SHA-1 (SHA-256 for AESV3) over the 20-byte seed, every
    Recipients string in array order, and 0xFFFFFFFF when
    /EncryptMetadata is false. Object-level decryption then reuses the
    standard handler's algorithms 1/1.A unchanged."""

    __slots__ = ("subfilter", "recipients", "perms", "_cf_key_bytes")

    def __init__(self, enc: dict, file_id: bytes | None):
        super().__init__(enc, file_id)
        self.subfilter = str(enc.get("SubFilter", ""))
        self.perms: int | None = None
        self._cf_key_bytes: int | None = None
        recipients = enc.get("Recipients")
        if recipients is None:
            cf = enc.get("CF")
            if isinstance(cf, dict):
                for name in (str(enc.get("StmF", "")),
                             str(enc.get("StrF", "")), "DefaultCryptFilter"):
                    f = cf.get(name)
                    if isinstance(f, dict) and "Recipients" in f:
                        recipients = f["Recipients"]
                        em = f.get("EncryptMetadata")
                        if isinstance(em, bool):
                            self.encrypt_metadata = em
                        # §7.6.5: a crypt-filter /Length is in BYTES
                        # (top-level /Length is bits).  Some producers
                        # still write bits there; treat >=40 as bits.
                        fl = f.get("Length")
                        if isinstance(fl, int) and fl > 0:
                            self._cf_key_bytes = fl // 8 if fl >= 40 else fl
                        elif str(f.get("CFM", "")) == "AESV2":
                            self._cf_key_bytes = 16
                        break
        if isinstance(recipients, bytes):
            recipients = [recipients]
        if not (isinstance(recipients, list) and recipients
                and all(isinstance(r, bytes) for r in recipients)):
            raise ValueError("missing /Recipients envelopes")
        self.recipients = [bytes(r) for r in recipients]
        # the pubkey handler has no R revision of its own; V drives
        # everything downstream (object keys, AESV3 direct key)

    def try_recipient_key(self, rsa_n: int, rsa_d: int) -> bool:
        from .signatures import SignatureError, open_enveloped_data

        opened: bytes | None = None
        for blob in self.recipients:
            try:
                opened = open_enveloped_data(blob, rsa_n, rsa_d)
                break
            except SignatureError:
                continue
            except Exception:
                # a structurally malformed foreign RecipientInfo (bad
                # DER, truncated OCTET STRING, ...) must not abort the
                # walk — keep trying the remaining envelopes
                continue
        if opened is None or len(opened) < 24:
            return False
        seed, perms = opened[:20], opened[20:24]
        self.perms = int.from_bytes(perms, "big")
        h = hashlib.sha256() if self.v == 5 else hashlib.sha1()
        h.update(seed)
        for blob in self.recipients:
            h.update(blob)
        if not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        if self.v == 5:
            self.key = h.digest()
        else:
            kb = (self._cf_key_bytes if self._cf_key_bytes
                  else self.length // 8)
            self.key = h.digest()[:max(5, min(kb, 16))]
        self.unlocked = True
        return True

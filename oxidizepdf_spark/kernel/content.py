"""Content-stream tokenizer and operator parser — the hot loop.

Reimplements (in-UDF, per page):

- ContentTokenizer incl. inline-image raw mode:
  oxidize-pdf-core/src/parser/content.rs:433-870
  (next_token 452, literal strings + octal 601-668, hex 672, names 745,
   read_operator 782, read_inline_image_data 808)
- ContentParser operand-stack dispatch over the full 73-operator set:
  content.rs:886-1306 (malformed-operator resync content.rs:985-999,
  the ``\"`` aw/ac ISO §9.4.3 operand order content.rs:1084-1093)

Tokenization strategy (BASELINE.json "batched byte-stream passes"): one
compiled master regex consumes whitespace/comments/numbers/names/operators/
delimiters in single C-level ``match`` calls at a moving cursor; only
literal strings (nesting + escapes) and inline-image payloads drop into a
dedicated scanner. Per-token Python overhead is one regex match + one
branch, with no per-character loops on the common path.

Operations are emitted as tuples ``(op, *operands)`` with the PDF operator
mnemonic as tag. Text-showing arrays (TJ) become lists of
``('t', bytes) | ('s', float)`` elements mirroring TextElement
(content.rs:405-411).
"""

from __future__ import annotations

import re

# Leading whitespace/comments are folded into every token match so the
# finditer sweep yields exactly one match per token (no separate skip
# matches — they would double the Python-level iteration count).
_MASTER = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*"  # fused skippable prefix
    rb"(?:(?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+))"
    # fast path: flat literal string (no nesting/escapes) resolved in-regex;
    # anything trickier falls through to the lstr scanner
    rb"|(?P<sstr>\([^()\\]*\))"
    rb"|(?P<lstr>\()"
    rb"|(?P<op>[^\x00\t\n\x0c\r ()<>\[\]{}/%;]+)"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<dopen><<)"
    rb"|(?P<dclose>>>)"
    rb"|(?P<hstr><[0-9A-Fa-f\x00\t\n\x0c\r ]*>)"
    rb"|(?P<aopen>\[)"
    rb"|(?P<aclose>\])"
    rb"|(?P<skipd>[;){}]))"
)

_NAME_HEX = re.compile(rb"#([0-9A-Fa-f]{2})")

_EOL_WS = b" \t\r\n\x0c"


class ContentParseError(Exception):
    pass


def _decode_name(raw: bytes) -> str:
    if b"#" in raw:
        raw = _NAME_HEX.sub(lambda m: bytes([int(m.group(1), 16)]), raw)
    return raw.decode("latin-1")


def _read_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """Literal string scanner (content.rs:601-652): nesting, escapes, octal
    with ISO §7.3.4.2 overflow (value & 0xFF)."""
    out = bytearray()
    depth = 1
    n = len(data)
    i = pos
    while i < n and depth > 0:
        c = data[i]
        i += 1
        if c == 0x5C:  # backslash
            if i >= n:
                break
            e = data[i]
            i += 1
            if e == 0x6E:
                out.append(0x0A)
            elif e == 0x72:
                out.append(0x0D)
            elif e == 0x74:
                out.append(0x09)
            elif e == 0x62:
                out.append(0x08)
            elif e == 0x66:
                out.append(0x0C)
            elif e in b"()\\":
                out.append(e)
            elif 0x30 <= e <= 0x37:
                val = e - 0x30
                cnt = 1
                while cnt < 3 and i < n and 0x30 <= data[i] <= 0x37:
                    val = val * 8 + (data[i] - 0x30)
                    i += 1
                    cnt += 1
                out.append(val & 0xFF)
            else:
                out.append(e)  # unknown escape → literal (content.rs:628)
        elif c == 0x28:
            depth += 1
            out.append(c)
        elif c == 0x29:
            depth -= 1
            if depth > 0:
                out.append(c)
        else:
            out.append(c)
    return bytes(out), i


def _read_inline_image_data(data: bytes, pos: int) -> tuple[bytes, int]:
    """Raw bytes between ID and EI (content.rs:808-870): skip one whitespace
    after ID, then scan for whitespace-preceded 'EI' followed by a boundary."""
    n = len(data)
    if pos < n and data[pos] in b" \n\r\t":
        ch = data[pos]
        pos += 1
        if ch == 0x0D and pos < n and data[pos] == 0x0A:
            pos += 1
    start = pos
    i = pos
    while i + 1 < n:
        preceded = i == start or data[i - 1] in _EOL_WS
        if preceded and data[i] == 0x45 and data[i + 1] == 0x49:  # 'EI'
            after = i + 2
            if after >= n or data[after] in b" \t\r\n\x0c/<([%":
                end = i
                if end > start and data[end - 1] in _EOL_WS:
                    end -= 1
                return data[start:end], after
        i += 1
    return data[start:], n


def tokenize(data: bytes) -> list[tuple]:
    """Tokenize a content stream; best-effort (keeps tokens on tail errors,
    content.rs:941-960). Token kinds: 'int' 'num' 'str' 'hex' 'name'
    'arr[' 'arr]' 'dict<<' 'dict>>' 'op' 'inline'.

    Bulk pass: ``finditer`` iterates contiguous token runs at C speed; the
    iterator is only restarted after the two constructs that move the cursor
    themselves (nested/escaped literal strings, inline-image payloads) —
    both rare, so nearly the whole stream tokenizes in one sweep."""
    tokens: list[tuple] = []
    push = tokens.append
    pos = 0
    n = len(data)
    gi = _MASTER.groupindex
    NUM, SSTR, OP, LSTR, HSTR, NAME = (
        gi["num"], gi["sstr"], gi["op"], gi["lstr"], gi["hstr"], gi["name"],
    )
    AOPEN, ACLOSE, DOPEN, DCLOSE = (
        gi["aopen"], gi["aclose"], gi["dopen"], gi["dclose"],
    )
    while pos < n:
        restart = False
        for m in _MASTER.finditer(data, pos):
            # bytes between matches are unhandled delimiters — skipped, same
            # as the reference (content.rs:509-514). Dispatch on the integer
            # group index (lastindex): faster than the name lookup, and
            # m.end() is only needed on the two restart branches.
            kind = m.lastindex
            if kind is None:
                continue  # whitespace/comment run
            if kind == NUM:
                t = m.group(NUM)
                if b"." in t:
                    push(("num", float(t)))
                else:
                    push(("int", int(t)))
            elif kind == SSTR:
                push(("str", m.group(SSTR)[1:-1]))
            elif kind == OP:
                op = m.group(OP).decode("latin-1")
                push(("op", op))
                if op == "ID":
                    payload, pos = _read_inline_image_data(data, m.end())
                    push(("inline", payload))
                    restart = True
                    break
            elif kind == LSTR:
                s, pos = _read_literal_string(data, m.end())
                push(("str", s))
                restart = True
                break
            elif kind == HSTR:
                h = m.group(HSTR)[1:-1]
                clean = bytes(c for c in h if c not in _EOL_WS)
                if len(clean) % 2:
                    clean += b"0"
                push(("hex", bytes.fromhex(clean.decode("ascii"))))
            elif kind == NAME:
                push(("name", _decode_name(m.group(NAME)[1:])))
            elif kind == AOPEN:
                push(("arr[", None))
            elif kind == ACLOSE:
                push(("arr]", None))
            elif kind == DOPEN:
                push(("dict<<", None))
            elif kind == DCLOSE:
                push(("dict>>", None))
            # 'skipd' delimiters are dropped
        if not restart:
            break
    return tokens


# --- operand pops (content.rs:1310-1420) -----------------------------------


def _pop_number(st: list) -> float:
    t = st.pop()
    if t[0] in ("num", "int"):
        return float(t[1])
    raise ContentParseError("expected number operand")


def _pop_integer(st: list) -> int:
    t = st.pop()
    if t[0] == "int":
        return t[1]
    raise ContentParseError("expected integer operand")


def _pop_name(st: list) -> str:
    t = st.pop()
    if t[0] == "name":
        return t[1]
    raise ContentParseError("expected name operand")


def _pop_string(st: list) -> bytes:
    t = st.pop()
    if t[0] in ("str", "hex"):
        return t[1]
    raise ContentParseError("expected string operand")


def _pop_array(st: list) -> list[tuple]:
    if st and st[-1][0] == "arr]":
        st.pop()
    arr: list[tuple] = []
    found = False
    while st:
        t = st.pop()
        if t[0] == "arr[":
            found = True
            break
        if t[0] == "arr]":
            continue
        arr.append(t)
    if not found:
        raise ContentParseError("expected array")
    arr.reverse()
    return arr


def _token_to_value(t: tuple, st: list):
    """Marked-content property values (content.rs token_to_mc_value)."""
    kind = t[0]
    if kind in ("str", "hex"):
        return t[1]
    if kind == "int":
        return t[1]
    if kind == "num":
        return t[1]
    if kind == "name":
        return t[1]
    if kind == "arr]":
        items = []
        while st:
            nxt = st.pop()
            if nxt[0] == "arr[":
                items.reverse()
                return items
            items.append(_token_to_value(nxt, st))
        raise ContentParseError("unterminated array in props")
    if kind == "dict>>":
        nested: dict = {}
        while st:
            nxt = st.pop()
            if nxt[0] == "dict<<":
                return nested
            value = _token_to_value(nxt, st)
            key = st.pop()
            if key[0] != "name":
                raise ContentParseError("expected name key in nested dict")
            nested[key[1]] = value
        raise ContentParseError("unterminated nested dict in props")
    raise ContentParseError(f"unexpected token in props: {kind}")


def _pop_dict_or_name(st: list):
    """BDC/DP props: Name → ('ref', name); inline dict → ('dict', {...})
    (content.rs:1392-1420)."""
    if not st:
        raise ContentParseError("expected dict or name operand")
    t = st.pop()
    if t[0] == "name":
        return ("ref", t[1])
    if t[0] == "dict>>":
        d: dict = {}
        while True:
            if not st:
                raise ContentParseError("unterminated inline dict")
            nxt = st.pop()
            if nxt[0] == "dict<<":
                break
            value = _token_to_value(nxt, st)
            if not st:
                raise ContentParseError("missing key in inline dict")
            key = st.pop()
            if key[0] != "name":
                raise ContentParseError("expected name key in inline dict")
            d[key[1]] = value
        return ("dict", d)
    raise ContentParseError("expected name or inline dict")


def _pop_colors(st: list) -> list[float]:
    comps: list[float] = []
    while st and st[-1][0] in ("num", "int"):
        comps.append(float(st.pop()[1]))
    comps.reverse()
    return comps


def _text_array(tokens: list[tuple]) -> list[tuple]:
    """TJ array → [('t', bytes) | ('s', float)] (content.rs parse_text_array)."""
    out = []
    for t in tokens:
        if t[0] in ("str", "hex"):
            out.append(("t", t[1]))
        elif t[0] in ("num", "int"):
            out.append(("s", float(t[1])))
        else:
            raise ContentParseError("invalid element in text array")
    return out


_INLINE_KEYS = {
    "W": "Width",
    "H": "Height",
    "CS": "ColorSpace",
    "BPC": "BitsPerComponent",
    "F": "Filter",
    "DP": "DecodeParms",
    "IM": "ImageMask",
    "I": "Interpolate",
    "D": "Decode",
}

# number-of-operand validation is implicit in the pop sequences below
_ZERO_OPERAND = {
    "BT": ("BT",),
    "ET": ("ET",),
    "T*": ("T*",),
    "q": ("q",),
    "Q": ("Q",),
    "h": ("h",),
    "S": ("S",),
    "s": ("s",),
    "f": ("f",),
    "F": ("f",),
    "f*": ("f*",),
    "B": ("B",),
    "B*": ("B*",),
    "b": ("b",),
    "b*": ("b*",),
    "n": ("n",),
    "W": ("W",),
    "W*": ("W*",),
    "EMC": ("EMC",),
    "BX": ("BX",),
    "EX": ("EX",),
}


def _apply_op(op: str, st: list, ops: list) -> None:
    """Dispatch one operator against the operand stack, appending the parsed
    operation (content.rs:1007-1306). Raises ContentParseError on operand
    mismatch / unknown operator; BI/ID/EI are handled by the callers."""
    if True:
        if True:
            z = _ZERO_OPERAND.get(op)
            if z is not None:
                ops.append(z)
            elif op == "Tj":
                ops.append(("Tj", _pop_string(st)))
            elif op == "TJ":
                ops.append(("TJ", _text_array(_pop_array(st))))
            elif op == "'":
                ops.append(("'", _pop_string(st)))
            elif op == '"':
                # ISO §9.4.3 operand order: aw ac string (content.rs:1084-1093)
                text = _pop_string(st)
                ac = _pop_number(st)
                aw = _pop_number(st)
                ops.append(('"', aw, ac, text))
            elif op == "Td":
                ty = _pop_number(st)
                tx = _pop_number(st)
                ops.append(("Td", tx, ty))
            elif op == "TD":
                ty = _pop_number(st)
                tx = _pop_number(st)
                ops.append(("TD", tx, ty))
            elif op == "Tm":
                f = _pop_number(st)
                e = _pop_number(st)
                d = _pop_number(st)
                c = _pop_number(st)
                b = _pop_number(st)
                a = _pop_number(st)
                ops.append(("Tm", a, b, c, d, e, f))
            elif op == "Tf":
                size = _pop_number(st)
                font = _pop_name(st)
                ops.append(("Tf", font, size))
            elif op == "Tc":
                ops.append(("Tc", _pop_number(st)))
            elif op == "Tw":
                ops.append(("Tw", _pop_number(st)))
            elif op == "Tz":
                ops.append(("Tz", _pop_number(st)))
            elif op == "TL":
                ops.append(("TL", _pop_number(st)))
            elif op == "Tr":
                ops.append(("Tr", _pop_integer(st)))
            elif op == "Ts":
                ops.append(("Ts", _pop_number(st)))
            elif op == "cm":
                f = _pop_number(st)
                e = _pop_number(st)
                d = _pop_number(st)
                c = _pop_number(st)
                b = _pop_number(st)
                a = _pop_number(st)
                ops.append(("cm", a, b, c, d, e, f))
            elif op == "w":
                ops.append(("w", _pop_number(st)))
            elif op == "J":
                ops.append(("J", _pop_integer(st)))
            elif op == "j":
                ops.append(("j", _pop_integer(st)))
            elif op == "M":
                ops.append(("M", _pop_number(st)))
            elif op == "d":
                phase = _pop_number(st)
                arr = _pop_array(st)
                pattern = [float(x[1]) for x in arr if x[0] in ("num", "int")]
                ops.append(("d", pattern, phase))
            elif op == "ri":
                ops.append(("ri", _pop_name(st)))
            elif op == "i":
                ops.append(("i", _pop_number(st)))
            elif op == "gs":
                ops.append(("gs", _pop_name(st)))
            elif op == "m":
                y = _pop_number(st)
                x = _pop_number(st)
                ops.append(("m", x, y))
            elif op == "l":
                y = _pop_number(st)
                x = _pop_number(st)
                ops.append(("l", x, y))
            elif op == "c":
                vals = [_pop_number(st) for _ in range(6)]
                ops.append(("c", *reversed(vals)))
            elif op == "v":
                vals = [_pop_number(st) for _ in range(4)]
                ops.append(("v", *reversed(vals)))
            elif op == "y":
                vals = [_pop_number(st) for _ in range(4)]
                ops.append(("y", *reversed(vals)))
            elif op == "re":
                h = _pop_number(st)
                wdt = _pop_number(st)
                y = _pop_number(st)
                x = _pop_number(st)
                ops.append(("re", x, y, wdt, h))
            elif op in ("CS", "cs", "sh", "Do"):
                ops.append((op, _pop_name(st)))
            elif op in ("SC", "SCN"):
                ops.append(("SC", _pop_colors(st)))
            elif op in ("sc", "scn"):
                ops.append(("sc", _pop_colors(st)))
            elif op == "G":
                ops.append(("G", _pop_number(st)))
            elif op == "g":
                ops.append(("g", _pop_number(st)))
            elif op == "RG":
                b3 = _pop_number(st)
                g2 = _pop_number(st)
                r1 = _pop_number(st)
                ops.append(("RG", r1, g2, b3))
            elif op == "rg":
                b3 = _pop_number(st)
                g2 = _pop_number(st)
                r1 = _pop_number(st)
                ops.append(("rg", r1, g2, b3))
            elif op == "K":
                vals = [_pop_number(st) for _ in range(4)]
                ops.append(("K", *reversed(vals)))
            elif op == "k":
                vals = [_pop_number(st) for _ in range(4)]
                ops.append(("k", *reversed(vals)))
            elif op == "BMC":
                ops.append(("BMC", _pop_name(st)))
            elif op == "BDC":
                props = _pop_dict_or_name(st)
                tag = _pop_name(st)
                ops.append(("BDC", tag, props))
            elif op == "MP":
                ops.append(("MP", _pop_name(st)))
            elif op == "DP":
                props = _pop_dict_or_name(st)
                tag = _pop_name(st)
                ops.append(("DP", tag, props))
            elif op == "ID" or op == "EI":
                # handled by callers / tokenizer; stray ones are skipped
                pass
            else:
                raise ContentParseError(f"unknown operator: {op}")


def parse_operators(tokens: list[tuple]) -> list[tuple]:
    """Operand-stack → operation list with per-operator resync on errors
    (content.rs:970-1010). Returns tuples tagged by mnemonic."""
    ops: list[tuple] = []
    st: list[tuple] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        i += 1
        if t[0] != "op":
            st.append(t)
            continue
        op = t[1]
        if op == "BI":
            st.clear()
            params, data, i = _parse_inline_image(tokens, i)
            ops.append(("BI", params, data))
            continue
        try:
            _apply_op(op, st, ops)
        except (ContentParseError, IndexError):
            pass  # skip malformed operator, resync (content.rs:985-999)
        st.clear()
    return ops


def _parse_inline_image(tokens: list[tuple], i: int) -> tuple[dict, bytes, int]:
    """BI … ID <raw> EI (content.rs:1563-1621). Returns (params, data, new_i)."""
    params: dict = {}
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t[0] == "op" and t[1] == "ID":
            i += 1
            break
        if t[0] == "name":
            key = _INLINE_KEYS.get(t[1], t[1])
            i += 1
            if i >= n:
                break
            v = tokens[i]
            if v[0] in ("int", "num"):
                params[key] = v[1]
            elif v[0] == "name":
                params[key] = v[1]
            elif v[0] in ("str", "hex"):
                params[key] = v[1]
            else:
                params[key] = None
            i += 1
        else:
            i += 1
    data = b""
    if i < n and tokens[i][0] == "inline":
        data = tokens[i][1]
        i += 1
    return params, data, i


def parse_content(data: bytes) -> list[tuple]:
    """One content stream → operation list in a SINGLE fused pass
    (content.rs parse_content:941): the finditer sweep pushes operands
    straight onto the operand stack and dispatches operators as they
    arrive — no intermediate token list. Inline images (BI…ID…EI) run a
    small in-loop state machine. Semantically identical to
    ``parse_operators(tokenize(data))`` (property-tested)."""
    ops: list[tuple] = []
    st: list[tuple] = []
    pos = 0
    n = len(data)
    gi = _MASTER.groupindex
    NUM, SSTR, OP, LSTR, HSTR, NAME = (
        gi["num"], gi["sstr"], gi["op"], gi["lstr"], gi["hstr"], gi["name"],
    )
    AOPEN, ACLOSE, DOPEN, DCLOSE = (
        gi["aopen"], gi["aclose"], gi["dopen"], gi["dclose"],
    )
    push = st.append
    bi_params: dict | None = None  # non-None while inside BI … ID
    bi_key: str | None = None
    while pos < n:
        restart = False
        for m in _MASTER.finditer(data, pos):
            kind = m.lastindex
            if kind is None:
                continue
            if kind == NUM:
                t = m.group(NUM)
                tok = ("num", float(t)) if b"." in t else ("int", int(t))
            elif kind == SSTR:
                tok = ("str", m.group(SSTR)[1:-1])
            elif kind == OP:
                op = m.group(OP).decode("latin-1")
                if bi_params is not None:
                    if op == "ID":
                        payload, pos = _read_inline_image_data(data, m.end())
                        ops.append(("BI", bi_params, payload))
                        bi_params = None
                        bi_key = None
                        restart = True
                        break
                    if bi_key is not None:
                        # keyword value (true/false/null) → None, matching
                        # _parse_inline_image's non-literal fallback
                        bi_params[bi_key] = None
                        bi_key = None
                    continue
                if op == "BI":
                    st.clear()
                    bi_params = {}
                    bi_key = None
                    continue
                if op == "ID":
                    # stray ID outside BI: consume payload, discard
                    _, pos = _read_inline_image_data(data, m.end())
                    restart = True
                    break
                try:
                    _apply_op(op, st, ops)
                except (ContentParseError, IndexError):
                    pass  # resync (content.rs:985-999)
                st.clear()
                continue
            elif kind == LSTR:
                sdata, pos = _read_literal_string(data, m.end())
                tok = ("str", sdata)
                if bi_params is not None:
                    if bi_key is not None:
                        bi_params[bi_key] = tok[1]
                        bi_key = None
                else:
                    push(tok)
                restart = True
                break
            elif kind == HSTR:
                h = m.group(HSTR)[1:-1]
                clean = bytes(c for c in h if c not in _EOL_WS)
                if len(clean) % 2:
                    clean += b"0"
                tok = ("hex", bytes.fromhex(clean.decode("ascii")))
            elif kind == NAME:
                tok = ("name", _decode_name(m.group(NAME)[1:]))
            elif kind == AOPEN:
                tok = ("arr[", None)
            elif kind == ACLOSE:
                tok = ("arr]", None)
            elif kind == DOPEN:
                tok = ("dict<<", None)
            elif kind == DCLOSE:
                tok = ("dict>>", None)
            else:  # skipd delimiters
                continue
            if bi_params is not None:
                # BI parameter collection (content.rs:1563-1621)
                if tok[0] == "name" and bi_key is None:
                    bi_key = _INLINE_KEYS.get(tok[1], tok[1])
                elif bi_key is not None:
                    bi_params[bi_key] = (
                        tok[1] if tok[0] in ("int", "num", "name", "str", "hex") else None
                    )
                    bi_key = None
                continue
            push(tok)
        if not restart:
            break
    return ops

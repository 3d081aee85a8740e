"""Type1 font program: eexec decryption + per-glyph advance widths.

Behavioral model: the reference runs a full PostScript interpreter and
Type1 charstring VM over embedded programs (`src/postscript/*`,
`src/font/type1/*`, ~4.3k LoC — pixels-only by SURVEY scoping). The text
pipeline needs exactly two things from the binary section that the
cleartext scan (fonts._type1_builtin_encoding) can't reach:

- the /CharStrings name → charstring map, and
- each charstring's FIRST operator ``hsbw`` (or ``sbw``), whose operand
  is the glyph's advance width (Type 1 spec §2.3 / §6.4).

Both are reachable with the two eexec ciphers (r=55665 for the private
section, r=4330 per charstring, Type 1 spec §7.2-7.3) and the charstring
NUMBER encoding — no interpreter, no outlines.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

_C1, _C2 = 52845, 22719
_HEX = b"0123456789abcdefABCDEF"


def eexec_decrypt(data: bytes, r: int = 55665, skip: int = 4) -> bytes:
    """Adobe eexec/charstring cipher (Type 1 spec §7.2): stateful XOR."""
    out = bytearray(len(data))
    for i, c in enumerate(data):
        out[i] = c ^ (r >> 8)
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out[skip:])


def eexec_encrypt(data: bytes, r: int = 55665,
                  lead: bytes = b"pdfs") -> bytes:
    """Fixture twin of eexec_decrypt (lead = the skip bytes)."""
    out = bytearray()
    for c in lead + data:
        e = c ^ (r >> 8)
        out.append(e)
        r = ((e + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


def charstring_width(cs: bytes, leniv: int = 4) -> Optional[float]:
    """Advance width from a DECRYPTED-container charstring: decrypt the
    charstring cipher (r=4330), then read the number-encoded operand
    stack until ``hsbw`` (13: sbx wx) or ``sbw`` (12 7: sbx sby wx wy).
    Any other operator first ⇒ malformed ⇒ None."""
    b = eexec_decrypt(cs, r=4330, skip=leniv)
    stack = []
    i, n = 0, len(b)
    while i < n:
        v = b[i]
        if 32 <= v <= 246:
            stack.append(v - 139)
            i += 1
        elif 247 <= v <= 250:
            if i + 1 >= n:
                return None
            stack.append((v - 247) * 256 + b[i + 1] + 108)
            i += 2
        elif 251 <= v <= 254:
            if i + 1 >= n:
                return None
            stack.append(-(v - 251) * 256 - b[i + 1] - 108)
            i += 2
        elif v == 255:
            if i + 4 >= n:
                return None
            stack.append(int.from_bytes(b[i + 1:i + 5], "big", signed=True))
            i += 5
        elif v == 13:  # hsbw: sbx wx
            return float(stack[1]) if len(stack) >= 2 else None
        elif v == 12:
            if i + 1 < n and b[i + 1] == 7:  # sbw: sbx sby wx wy
                return float(stack[2]) if len(stack) >= 4 else None
            return None
        else:
            return None
    return None


_ENTRY_RE = re.compile(rb"/([^\s/{}()\[\]<>]+)\s+(\d+)\s+(?:RD|-\|)\s")


def parse_type1_widths(data: bytes) -> Dict[str, float]:
    """glyph name → advance width for every /CharStrings entry of a full
    Type1 program (cleartext + eexec section, binary or hex form)."""
    _, sep, enc = data.partition(b"eexec")
    if not sep:
        return {}
    body = enc.lstrip(b"\r\n\t ")
    if len(body) >= 4 and all(c in _HEX for c in body[:4]):
        import binascii

        hx = re.sub(rb"[^0-9A-Fa-f]", b"", body)
        body = binascii.unhexlify(hx[: len(hx) // 2 * 2])
    priv = eexec_decrypt(body)
    m = re.search(rb"/lenIV\s+(\d+)", priv)
    leniv = int(m.group(1)) if m else 4
    out: Dict[str, float] = {}
    cur = priv.find(b"/CharStrings")
    if cur == -1:
        return out
    # manual cursor walk: each entry header is text, the charstring body
    # is binary — advancing past the declared length keeps the regex from
    # ever scanning inside charstring bytes
    while len(out) < 10000:
        m = _ENTRY_RE.search(priv, cur)
        if m is None:
            break
        name = m.group(1).decode("latin-1")
        n = int(m.group(2))
        start = m.end()
        if n < 0 or start + n > len(priv):
            break
        w = charstring_width(priv[start:start + n], leniv)
        if w is not None and name != ".notdef":
            out[name] = w
        cur = start + n
    return out

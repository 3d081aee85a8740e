"""CFF (Compact Font Format) charset/encoding reader — FN9-lite
(SURVEY.md §2A.6).

Reads ONLY what text extraction needs from an embedded Type1C program
(`FontFile3 /Subtype /Type1C`): the built-in code→glyph-name mapping,
via Encoding (code→GID) ∘ charset (GID→SID) ∘ strings (SID→name).
Charstring outlines (the reference's 1100-line Type2 VM,
`src/font/cff/`) are pixels-only and not ported.

Format: Adobe Technical Note #5176 (public spec).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

# Standard strings, SIDs 0..228 (ISOAdobe charset range — the text-
# relevant prefix; SIDs 229..390 are the expert/small-caps set whose
# names have no AGL text mapping and decode to replacement anyway).
STANDARD_STRINGS: List[str] = [
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater", "question",
    "at", "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L",
    "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h",
    "i", "j", "k", "l", "m", "n", "o", "p", "q", "r", "s", "t", "u",
    "v", "w", "x", "y", "z", "braceleft", "bar", "braceright",
    "asciitilde", "exclamdown", "cent", "sterling", "fraction", "yen",
    "florin", "section", "currency", "quotesingle", "quotedblleft",
    "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl",
    "endash", "dagger", "daggerdbl", "periodcentered", "paragraph",
    "bullet", "quotesinglbase", "quotedblbase", "quotedblright",
    "guillemotright", "ellipsis", "perthousand", "questiondown",
    "grave", "acute", "circumflex", "tilde", "macron", "breve",
    "dotaccent", "dieresis", "ring", "cedilla", "hungarumlaut",
    "ogonek", "caron", "emdash", "AE", "ordfeminine", "Lslash",
    "Oslash", "OE", "ordmasculine", "ae", "dotlessi", "lslash",
    "oslash", "oe", "germandbls", "onesuperior", "logicalnot", "mu",
    "trademark", "Eth", "onehalf", "plusminus", "Thorn", "onequarter",
    "divide", "brokenbar", "degree", "thorn", "threequarters",
    "twosuperior", "registered", "minus", "eth", "multiply",
    "threesuperior", "copyright", "Aacute", "Acircumflex", "Adieresis",
    "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute", "Ecircumflex",
    "Edieresis", "Egrave", "Iacute", "Icircumflex", "Idieresis",
    "Igrave", "Ntilde", "Oacute", "Ocircumflex", "Odieresis", "Ograve",
    "Otilde", "Scaron", "Uacute", "Ucircumflex", "Udieresis", "Ugrave",
    "Yacute", "Ydieresis", "Zcaron", "aacute", "acircumflex",
    "adieresis", "agrave", "aring", "atilde", "ccedilla", "eacute",
    "ecircumflex", "edieresis", "egrave", "iacute", "icircumflex",
    "idieresis", "igrave", "ntilde", "oacute", "ocircumflex",
    "odieresis", "ograve", "otilde", "scaron", "uacute", "ucircumflex",
    "udieresis", "ugrave", "yacute", "ydieresis", "zcaron",
]


def _read_index(data: bytes, pos: int) -> Tuple[List[bytes], int]:
    """CFF INDEX → (items, next_pos)."""
    if pos + 2 > len(data):
        return [], pos + 2
    count = struct.unpack_from(">H", data, pos)[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    offs = []
    for i in range(count + 1):
        offs.append(int.from_bytes(data[pos : pos + off_size], "big"))
        pos += off_size
    base = pos - 1
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[count]


def _parse_dict(data: bytes) -> Dict[int, list]:
    """Top DICT: operands precede 1-2 byte operators. Operators keyed as
    op (one byte) or 0xC00 | op2 (escaped)."""
    out: Dict[int, list] = {}
    operands: list = []
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:  # operator
            if b0 == 12 and i + 1 < n:
                out[0xC00 | data[i + 1]] = operands
                i += 2
            else:
                out[b0] = operands
                i += 1
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b0 == 30:  # real: nibble-encoded, skip to terminator
            i += 1
            val = ""
            while i < n:
                hi, lo = data[i] >> 4, data[i] & 0xF
                i += 1
                done = False
                for nib in (hi, lo):
                    if nib == 0xF:
                        done = True
                        break
                    val += "0123456789.EE?-?"[nib] if nib != 0xC else "E-"
                if done:
                    break
            try:
                operands.append(float(val.replace("?", "")))
            except ValueError:
                operands.append(0.0)
        else:
            i += 1
    return out


def parse_cff_code_to_name(data: bytes) -> Dict[int, str]:
    """code → glyph name from a CFF's built-in Encoding + charset.
    Returns {} on any structural problem (callers fall back)."""
    try:
        if len(data) < 4:
            return {}
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        if not top_dicts:
            return {}
        top = _parse_dict(top_dicts[0])
        charstrings_off = top.get(17)
        if not charstrings_off:
            return {}
        charstrings, _ = _read_index(data, int(charstrings_off[0]))
        n_glyphs = len(charstrings)
        if n_glyphs == 0:
            return {}

        def sid_name(sid: int) -> Optional[str]:
            if sid < len(STANDARD_STRINGS):
                return STANDARD_STRINGS[sid]
            idx = sid - 391
            if 0 <= idx < len(strings):
                return strings[idx].decode("latin-1", "replace")
            return None

        # charset → gid→SID (gid 0 is always .notdef)
        gid_to_sid = {0: 0}
        charset_off = top.get(15, [0])
        cs = int(charset_off[0]) if charset_off else 0
        if cs == 0:  # ISOAdobe: identity SIDs
            for gid in range(1, n_glyphs):
                gid_to_sid[gid] = gid
        elif cs in (1, 2):  # Expert charsets — not text-relevant
            return {}
        else:
            fmt = data[cs]
            p = cs + 1
            if fmt == 0:
                for gid in range(1, n_glyphs):
                    gid_to_sid[gid] = struct.unpack_from(">H", data, p)[0]
                    p += 2
            elif fmt in (1, 2):
                gid = 1
                step = 3 if fmt == 1 else 4
                while gid < n_glyphs:
                    first = struct.unpack_from(">H", data, p)[0]
                    nleft = (
                        data[p + 2] if fmt == 1
                        else struct.unpack_from(">H", data, p + 2)[0]
                    )
                    p += step
                    for k in range(nleft + 1):
                        if gid >= n_glyphs:
                            break
                        gid_to_sid[gid] = first + k
                        gid += 1
            else:
                return {}

        # Encoding → code→gid
        enc_off = top.get(16, [0])
        eo = int(enc_off[0]) if enc_off else 0
        code_to_gid: Dict[int, int] = {}
        if eo in (0, 1):
            # Standard/Expert encoding: code→name→SID→gid. Resolve via
            # name match against the charset (sufficient for Standard).
            name_to_gid = {
                sid_name(s): g for g, s in gid_to_sid.items()
            }
            from pdfspark.kernel.encodings_data import STANDARD_ENCODING

            inv_std = {}
            for code, ch in STANDARD_ENCODING.items():
                inv_std[code] = ch
            # map code→gid by matching standard glyph NAMES: reuse the
            # standard-strings prefix (codes 32..126 ↔ SIDs 1..95)
            for code in range(32, 127):
                sid = code - 31
                nm = STANDARD_STRINGS[sid] if sid < len(STANDARD_STRINGS) else None
                if nm in name_to_gid:
                    code_to_gid[code] = name_to_gid[nm]
        else:
            fmt = data[eo] & 0x7F
            p = eo + 1
            if fmt == 0:
                n_codes = data[p]
                p += 1
                for gid in range(1, n_codes + 1):
                    code_to_gid[data[p]] = gid
                    p += 1
            elif fmt == 1:
                n_ranges = data[p]
                p += 1
                gid = 1
                for _ in range(n_ranges):
                    first, nleft = data[p], data[p + 1]
                    p += 2
                    for k in range(nleft + 1):
                        code_to_gid[first + k] = gid
                        gid += 1
            else:
                return {}

        out: Dict[int, str] = {}
        for code, gid in code_to_gid.items():
            sid = gid_to_sid.get(gid)
            if sid is None:
                continue
            nm = sid_name(sid)
            if nm:
                out[code] = nm
        return out
    except (struct.error, IndexError, ValueError):
        return {}


def _type2_leading_width(cs: bytes, default_w: float,
                         nominal_w: float) -> float:
    """Advance width of one Type2 charstring WITHOUT running the VM
    (Type 2 spec §3.1): the width operand, when present, precedes the
    first stem/moveto/endchar operator and makes the operand count odd
    (stems) or one-more-than-expected (movetos/endchar)."""
    stack: list = []
    i, n = 0, len(cs)
    while i < n:
        v = cs[i]
        if 32 <= v <= 246:
            stack.append(v - 139)
            i += 1
        elif 247 <= v <= 250 and i + 1 < n:
            stack.append((v - 247) * 256 + cs[i + 1] + 108)
            i += 2
        elif 251 <= v <= 254 and i + 1 < n:
            stack.append(-(v - 251) * 256 - cs[i + 1] - 108)
            i += 2
        elif v == 28 and i + 2 < n:
            stack.append(struct.unpack_from(">h", cs, i + 1)[0])
            i += 3
        elif v == 255 and i + 4 < n:
            stack.append(struct.unpack_from(">i", cs, i + 1)[0] / 65536.0)
            i += 5
        else:
            op = v
            if op in (1, 3, 18, 23, 19, 20):  # stems/masks: even args
                has_w = len(stack) % 2 == 1
            elif op in (4, 22):  # v/hmoveto: 1 arg
                has_w = len(stack) > 1
            elif op == 21:  # rmoveto: 2 args
                has_w = len(stack) > 2
            elif op == 14:  # endchar: 0 or 4 args
                has_w = len(stack) in (1, 5)
            else:
                has_w = False
            return nominal_w + float(stack[0]) if has_w else default_w
    return default_w


def parse_cff_widths(data: bytes) -> Dict[str, float]:
    """glyph name → advance width for a CFF/Type1C program: Private DICT
    defaultWidthX (20) / nominalWidthX (21) plus each charstring's
    leading width operand. {} on any structural problem."""
    try:
        if len(data) < 4:
            return {}
        pos = data[2]
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        if not top_dicts:
            return {}
        top = _parse_dict(top_dicts[0])
        cs_off = top.get(17)
        if not cs_off:
            return {}
        charstrings, _ = _read_index(data, int(cs_off[0]))
        n_glyphs = len(charstrings)
        if n_glyphs == 0:
            return {}
        default_w, nominal_w = 0.0, 0.0
        priv = top.get(18)
        if priv and len(priv) >= 2:
            sz, off = int(priv[0]), int(priv[1])
            if 0 <= off and off + sz <= len(data):
                pd = _parse_dict(data[off:off + sz])
                default_w = float(pd.get(20, [0])[0])
                nominal_w = float(pd.get(21, [0])[0])

        def sid_name(sid: int) -> Optional[str]:
            if sid < len(STANDARD_STRINGS):
                return STANDARD_STRINGS[sid]
            idx = sid - 391
            if 0 <= idx < len(strings):
                return strings[idx].decode("latin-1", "replace")
            return None

        gid_to_sid = {0: 0}
        cs = int(top.get(15, [0])[0]) if top.get(15) else 0
        if cs == 0:
            for gid in range(1, n_glyphs):
                gid_to_sid[gid] = gid
        elif cs in (1, 2):
            return {}
        else:
            fmt = data[cs]
            p = cs + 1
            if fmt == 0:
                for gid in range(1, n_glyphs):
                    gid_to_sid[gid] = struct.unpack_from(">H", data, p)[0]
                    p += 2
            elif fmt in (1, 2):
                gid = 1
                step = 3 if fmt == 1 else 4
                while gid < n_glyphs:
                    first = struct.unpack_from(">H", data, p)[0]
                    nleft = (data[p + 2] if fmt == 1
                             else struct.unpack_from(">H", data, p + 2)[0])
                    p += step
                    for k in range(nleft + 1):
                        if gid >= n_glyphs:
                            break
                        gid_to_sid[gid] = first + k
                        gid += 1
            else:
                return {}

        out: Dict[str, float] = {}
        for gid in range(1, n_glyphs):
            nm = sid_name(gid_to_sid.get(gid, 0))
            if nm and nm != ".notdef":
                out[nm] = _type2_leading_width(
                    bytes(charstrings[gid]), default_w, nominal_w
                )
        return out
    except (struct.error, IndexError, ValueError):
        return {}

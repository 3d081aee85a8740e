"""Base encoding tables + Adobe-Glyph-List-style name resolution.

Data source: PDF 32000-1:2008 Annex D (public spec) — the same tables the
reference hardcodes in `src/font/encoding.rs:31-54`. WinAnsi and MacRoman
are generated from Python's cp1252 / mac_roman codecs (identical mappings);
StandardEncoding's non-ASCII upper half is spelled out.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache
from typing import Dict, Optional

# ---------------------------------------------------------------- Standard

# ASCII range with Adobe's two substitutions (0x27→quoteright, 0x60→quoteleft)
_STD: Dict[int, str] = {c: chr(c) for c in range(0x20, 0x7F)}
_STD[0x27] = "’"
_STD[0x60] = "‘"
_STD.update({
    0o241: "¡", 0o242: "¢", 0o243: "£", 0o244: "⁄",
    0o245: "¥", 0o246: "ƒ", 0o247: "§", 0o250: "¤",
    0o251: "'", 0o252: "“", 0o253: "«", 0o254: "‹",
    0o255: "›", 0o256: "ﬁ", 0o257: "ﬂ", 0o261: "–",
    0o262: "†", 0o263: "‡", 0o264: "·", 0o266: "¶",
    0o267: "•", 0o270: "‚", 0o271: "„", 0o272: "”",
    0o273: "»", 0o274: "…", 0o275: "‰", 0o277: "¿",
    0o301: "`", 0o302: "´", 0o303: "ˆ", 0o304: "˜",
    0o305: "¯", 0o306: "˘", 0o307: "˙", 0o310: "¨",
    0o312: "˚", 0o313: "¸", 0o315: "˝", 0o316: "˛",
    0o317: "ˇ", 0o320: "—", 0o341: "Æ", 0o343: "ª",
    0o350: "Ł", 0o351: "Ø", 0o352: "Œ", 0o353: "º",
    0o361: "æ", 0o365: "ı", 0o370: "ł", 0o371: "ø",
    0o372: "œ", 0o373: "ß",
})
STANDARD_ENCODING: Dict[int, str] = _STD

# ---------------------------------------------------------------- WinAnsi

_WINANSI: Dict[int, str] = {}
for _c in range(0x20, 0x100):
    if _c in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        continue  # undefined in WinAnsi
    _WINANSI[_c] = bytes([_c]).decode("cp1252")
WINANSI_ENCODING: Dict[int, str] = _WINANSI

# --------------------------------------------------------------- MacRoman

MACROMAN_ENCODING: Dict[int, str] = {
    c: bytes([c]).decode("mac_roman") for c in range(0x20, 0x100)
}

BASE_ENCODINGS: Dict[str, Dict[int, str]] = {
    "StandardEncoding": STANDARD_ENCODING,
    "WinAnsiEncoding": WINANSI_ENCODING,
    "MacRomanEncoding": MACROMAN_ENCODING,
    # MacExpert holds only expert-set glyphs (small caps etc.) — map the
    # overlap to Standard as a pragmatic fallback
    "MacExpertEncoding": STANDARD_ENCODING,
}

# ----------------------------------------------------------------- glyph names

# literal AGL subset: ASCII names + common typographic/punct names
_ASCII_NAMES = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33, "four": 0x34,
    "five": 0x35, "six": 0x36, "seven": 0x37, "eight": 0x38, "nine": 0x39,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40, "bracketleft": 0x5B,
    "backslash": 0x5C, "bracketright": 0x5D, "asciicircum": 0x5E,
    "underscore": 0x5F, "grave": 0x60, "braceleft": 0x7B, "bar": 0x7C,
    "braceright": 0x7D, "asciitilde": 0x7E,
}
_EXTRA_NAMES = {
    "quoteright": "’", "quoteleft": "‘", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚",
    "quotedblbase": "„", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "perthousand": "‰", "fraction": "⁄",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "exclamdown": "¡", "questiondown": "¿", "cent": "¢",
    "sterling": "£", "yen": "¥", "florin": "ƒ",
    "section": "§", "currency": "¤", "paragraph": "¶",
    "periodcentered": "·", "degree": "°", "copyright": "©",
    "registered": "®", "trademark": "™", "plusminus": "±",
    "multiply": "×", "divide": "÷", "logicalnot": "¬",
    "mu": "µ", "nbspace": " ", "softhyphen": "­",
    "fi": "ﬁ", "fl": "ﬂ", "germandbls": "ß",
    "dotlessi": "ı", "Lslash": "Ł", "lslash": "ł",
    "Oslash": "Ø", "oslash": "ø", "OE": "Œ", "oe": "œ",
    "AE": "Æ", "ae": "æ", "ordfeminine": "ª",
    "ordmasculine": "º", "acute": "´", "dieresis": "¨",
    "macron": "¯", "cedilla": "¸", "circumflex": "ˆ",
    "caron": "ˇ", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "ogonek": "˛", "tilde": "˜",
    "hungarumlaut": "˝", "minus": "−", "Euro": "€",
    "brokenbar": "¦", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "onesuperior": "¹",
    "twosuperior": "²", "threesuperior": "³",
}

_AGL: Dict[str, str] = {n: chr(c) for n, c in _ASCII_NAMES.items()}
_AGL.update(_EXTRA_NAMES)
for _c in range(0x41, 0x5B):  # A-Z, a-z map to themselves
    _AGL[chr(_c)] = chr(_c)
    _AGL[chr(_c + 0x20)] = chr(_c + 0x20)

_ACCENT_WORDS = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "caron": "CARON", "breve": "BREVE",
    "macron": "MACRON", "ogonek": "OGONEK", "hungarumlaut": "DOUBLE ACUTE",
    "slash": "STROKE", "dotaccent": "DOT ABOVE",
}


@lru_cache(maxsize=4096)
def glyph_name_to_unicode(name: str) -> Optional[str]:
    """Resolve a glyph name to a unicode string, AGL-style: literal table,
    then ``uniXXXX``/``uXXXX[XX]`` forms, then base+accent composition via
    unicodedata, else None."""
    if not name:
        return None
    hit = _AGL.get(name)
    if hit is not None:
        return hit
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(
                chr(int(name[i : i + 4], 16)) for i in range(3, len(name) - 3, 4)
            )
        except ValueError:
            pass
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            pass
    # accented-letter composition: e.g. 'aacute', 'Odieresis'
    if len(name) >= 2 and name[0].isalpha() and name[1:].lower() in _ACCENT_WORDS:
        base = name[0]
        case = "CAPITAL" if base.isupper() else "SMALL"
        try:
            return unicodedata.lookup(
                f"LATIN {case} LETTER {base.upper()} WITH "
                f"{_ACCENT_WORDS[name[1:].lower()]}"
            )
        except KeyError:
            pass
    if len(name) == 1:
        return name
    return None

"""Base-14 default advance widths (FN-adjacent: `src/font/mod.rs:53-97`
loads real base-14 font programs with an alias table; we carry only their
AFM width metrics — glyph outlines are pixels and stay unported).

Data source: the public Adobe Core 14 AFM metrics (Helvetica.afm,
Times-Roman.afm, Courier.afm), printable-ASCII range. Widths are glyph-
space units (/1000 text space). Bold/italic cuts reuse the regular table —
a documented approximation that only nudges x-advances; the linearization
policy keys newlines on y, so extracted text is unaffected.
"""

from __future__ import annotations

from typing import Dict, Optional

# char → width, Helvetica.afm (Adobe Core 14)
_HELVETICA = {
    " ": 278, "!": 278, '"': 355, "#": 556, "$": 556, "%": 889, "&": 667,
    "'": 191, "(": 333, ")": 333, "*": 389, "+": 584, ",": 278, "-": 333,
    ".": 278, "/": 278, "0": 556, "1": 556, "2": 556, "3": 556, "4": 556,
    "5": 556, "6": 556, "7": 556, "8": 556, "9": 556, ":": 278, ";": 278,
    "<": 584, "=": 584, ">": 584, "?": 556, "@": 1015, "A": 667, "B": 667,
    "C": 722, "D": 722, "E": 667, "F": 611, "G": 778, "H": 722, "I": 278,
    "J": 500, "K": 667, "L": 556, "M": 833, "N": 722, "O": 778, "P": 667,
    "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722, "V": 667, "W": 944,
    "X": 667, "Y": 667, "Z": 611, "[": 278, "\\": 278, "]": 278, "^": 469,
    "_": 556, "`": 333, "a": 556, "b": 556, "c": 500, "d": 556, "e": 556,
    "f": 278, "g": 556, "h": 556, "i": 222, "j": 222, "k": 500, "l": 222,
    "m": 833, "n": 556, "o": 556, "p": 556, "q": 556, "r": 333, "s": 500,
    "t": 278, "u": 556, "v": 500, "w": 722, "x": 500, "y": 500, "z": 500,
    "{": 334, "|": 260, "}": 334, "~": 584,
}

# char → width, Times-Roman.afm (Adobe Core 14)
_TIMES = {
    " ": 250, "!": 333, '"': 408, "#": 500, "$": 500, "%": 833, "&": 778,
    "'": 180, "(": 333, ")": 333, "*": 500, "+": 564, ",": 250, "-": 333,
    ".": 250, "/": 278, "0": 500, "1": 500, "2": 500, "3": 500, "4": 500,
    "5": 500, "6": 500, "7": 500, "8": 500, "9": 500, ":": 278, ";": 278,
    "<": 564, "=": 564, ">": 564, "?": 444, "@": 921, "A": 722, "B": 667,
    "C": 667, "D": 722, "E": 611, "F": 556, "G": 722, "H": 722, "I": 333,
    "J": 389, "K": 722, "L": 611, "M": 889, "N": 722, "O": 722, "P": 556,
    "Q": 722, "R": 667, "S": 556, "T": 611, "U": 722, "V": 722, "W": 944,
    "X": 722, "Y": 722, "Z": 611, "[": 333, "\\": 278, "]": 333, "^": 469,
    "_": 500, "`": 333, "a": 444, "b": 500, "c": 444, "d": 500, "e": 444,
    "f": 333, "g": 500, "h": 500, "i": 278, "j": 278, "k": 500, "l": 278,
    "m": 778, "n": 500, "o": 500, "p": 500, "q": 500, "r": 333, "s": 389,
    "t": 278, "u": 500, "v": 500, "w": 722, "x": 500, "y": 500, "z": 444,
    "{": 480, "|": 200, "}": 480, "~": 541,
}

_FAMILY_TABLES = {
    "Helvetica": _HELVETICA,
    "Times": _TIMES,
    "Courier": None,  # fixed-pitch: every glyph 600
}

# BaseFont name → base-14 family (the reference's alias table shape,
# `src/font/mod.rs:53-97`): TrueType stand-ins map to their metric twins
_ALIASES = {
    "helvetica": "Helvetica", "arial": "Helvetica",
    "arialmt": "Helvetica", "arial-bold": "Helvetica",
    "times": "Times", "times-roman": "Times", "timesroman": "Times",
    "timesnewroman": "Times", "timesnewromanpsmt": "Times",
    "courier": "Courier", "couriernew": "Courier",
    "couriernewpsmt": "Courier",
}


def base14_family(base_font: str) -> Optional[str]:
    """Normalize a /BaseFont name (subset prefix, bold/italic suffixes)
    to its base-14 metric family, or None."""
    name = base_font or ""
    if len(name) > 7 and name[6] == "+":  # 'ABCDEF+' subset prefix
        name = name[7:]
    name = name.lower()
    for suffix in ("-boldoblique", "-bolditalic", "-oblique", "-italic",
                   "-bold", "-roman", "bold", "italic", "oblique",
                   ",bold", ",italic", ",bolditalic"):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
            break
    name = name.rstrip("-,")
    return _ALIASES.get(name)


def base14_widths(base_font: str, encoding_map: Dict[int, str],
                  default: float = 500.0) -> Optional[list]:
    """256-entry code→width list for an UNembedded base-14 font without
    /Widths, keyed through the font's resolved encoding; codes outside
    the AFM table keep ``default``. None when the name doesn't alias to
    a base-14 family."""
    family = base14_family(base_font)
    if family is None:
        return None
    if family == "Courier":
        return [600.0] * 256
    table = _FAMILY_TABLES[family]
    out = []
    for code in range(256):
        ch = encoding_map.get(code)
        w = table.get(ch) if ch is not None else None
        out.append(float(w) if w is not None else default)
    return out

"""Stream filter cascade (SURVEY.md §2A.3, F1-F6).

Cascade driver mirrors `src/filter/mod.rs:17-63`: apply ``Filter[i]`` with
``DecodeParms[i]`` in order. Unlike the reference we implement ALL five PNG
predictors (the reference stubs Sub/None/Average/Paeth,
`src/filter/flate.rs:104-137`) plus LZW and RunLength (both ``todo!()`` in
the reference, `src/filter/mod.rs:43,50`) per PDF 32000-1:2008 §7.4.

Image codecs (DCT/JPX/CCITT/JBIG2) are passed through untouched — they are
terminal image payloads, never wrap text-bearing streams.
"""

from __future__ import annotations

import binascii
import zlib

import numpy as np

from pdfspark.kernel.objects import Name, PdfError, Stream

IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "CCF",
                 "JBIG2Decode"}
_ABBREV = {"Fl": "FlateDecode", "AHx": "ASCIIHexDecode", "A85": "ASCII85Decode",
           "LZW": "LZWDecode", "RL": "RunLengthDecode"}


MAX_DECODED = 256 * 1024 * 1024  # decompression-bomb cap (checked mid-stream)


def flate_decode(data: bytes, parms: dict) -> bytes:
    """F1: zlib inflate + predictor undo.

    Inflation is chunked with ``max_length`` so a decompression bomb is
    rejected at the cap instead of materializing the full output first
    (one bad PDF must never OOM-kill the executor)."""
    d = zlib.decompressobj()
    out = bytearray()
    try:
        buf = bytes(data)
        while True:
            chunk = d.decompress(buf, 8 << 20)
            out += chunk
            if len(out) > MAX_DECODED:
                raise PdfError("too-large", f"flate output exceeds {MAX_DECODED}")
            buf = d.unconsumed_tail
            if not buf:
                break
        out += d.flush()
    except zlib.error as e:
        if not out:  # tolerate truncated tails (web-crawl dirt)
            raise PdfError("filter", f"flate: {e}")
    return _apply_predictor(bytes(out), parms)


def _apply_predictor(raw: bytes, parms: dict) -> bytes:
    predictor = int(parms.get("Predictor", 1) or 1)
    if predictor <= 1:
        return raw
    colors = int(parms.get("Colors", 1) or 1)
    bpc = int(parms.get("BitsPerComponent", 8) or 8)
    columns = int(parms.get("Columns", 1) or 1)
    bpp = max(1, (colors * bpc) // 8)  # bytes per pixel
    rowlen = (columns * colors * bpc + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing (bpc==8 path)
        if bpc != 8:
            raise PdfError("filter", f"tiff predictor bpc={bpc} unsupported")
        arr = np.frombuffer(raw, dtype=np.uint8)
        nrows = len(arr) // rowlen
        arr = arr[: nrows * rowlen].reshape(nrows, rowlen).copy()
        for i in range(bpp, rowlen):
            arr[:, i] = (arr[:, i] + arr[:, i - bpp]) & 0xFF
        return arr.tobytes()
    # PNG predictors: each row prefixed with a per-row filter-type byte.
    # Up/None vectorize across the row (numpy); the sequential recurrences
    # (Sub/Average/Paeth) run on plain Python ints — ~10× faster than
    # per-element numpy scalar indexing.
    stride = rowlen + 1
    nrows = len(raw) // stride
    out = bytearray()
    prev = [0] * rowlen
    np_prev = np.zeros(rowlen, dtype=np.int32)
    for r in range(nrows):
        base = r * stride
        ft = raw[base]
        cur = raw[base + 1 : base + 1 + rowlen]
        if ft == 0:  # None
            line = list(cur)
        elif ft == 2:  # Up (the only one the reference completes)
            line = (
                (np.frombuffer(cur, dtype=np.uint8).astype(np.int32) + np_prev)
                & 0xFF
            ).tolist()
        elif ft == 1:  # Sub
            line = list(cur)
            for i in range(bpp, rowlen):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 3:  # Average
            line = list(cur)
            for i in range(rowlen):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            line = list(cur)
            for i in range(rowlen):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise PdfError("filter", f"png predictor type {ft}")
        if len(line) < rowlen:
            line = line + [0] * (rowlen - len(line))
        out += bytes(line)
        prev = line
        np_prev = np.asarray(line, dtype=np.int32)
    return bytes(out)


def asciihex_decode(data: bytes, parms: dict) -> bytes:
    """F2: hex pairs, whitespace-tolerant, ``>`` EOD, odd length pads 0."""
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    data = bytes(c for c in data if c not in b"\x00\t\n\x0c\r ")
    if len(data) % 2:
        data += b"0"
    try:
        return binascii.unhexlify(data)
    except binascii.Error as e:
        raise PdfError("filter", f"asciihex: {e}")


def ascii85_decode(data: bytes, parms: dict) -> bytes:
    """F3: base-85 with ``z`` groups and ``~>`` EOD."""
    data = bytes(c for c in data if c not in b"\x00\t\n\x0c\r ")
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    import base64

    try:
        return base64.a85decode(data)
    except ValueError as e:
        raise PdfError("filter", f"ascii85: {e}")


def lzw_decode(data: bytes, parms: dict) -> bytes:
    """F5: PDF LZW (9→12-bit codes, clear=256, EOD=257, EarlyChange
    default 1) per PDF 32000 §7.4.4. The reference leaves this ``todo!()``
    (`src/filter/mod.rs:43`)."""
    early = int(parms.get("EarlyChange", 1) or 0) if "EarlyChange" in parms else 1
    table: list = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    prev: bytes | None = None
    done = False
    for byte in bytes(data):
        if done:
            break
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                done = True
                break
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfError("filter", f"lzw bad code {code}")
            out += entry
            prev = entry
            if len(out) > MAX_DECODED:
                raise PdfError("too-large", "lzw output exceeds cap")
            # EarlyChange=1 widens one code early (PDF 32000 §7.4.4.2);
            # +1 because the decoder's table lags the encoder's by one entry
            if len(table) + early + 1 >= (1 << width) and width < 12:
                width += 1
    return _apply_predictor(bytes(out), parms)


def runlength_decode(data: bytes, parms: dict) -> bytes:
    """F6: RLE per PDF 32000 §7.4.5 (``todo!()`` in the reference)."""
    out = bytearray()
    i, n = 0, len(data)
    data = bytes(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:  # EOD
            break
        if length < 128:
            out += data[i : i + length + 1]
            i += length + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - length)
                i += 1
    return bytes(out)


_DECODERS = {
    "FlateDecode": flate_decode,
    "ASCIIHexDecode": asciihex_decode,
    "ASCII85Decode": ascii85_decode,
    "LZWDecode": lzw_decode,
    "RunLengthDecode": runlength_decode,
    # F10: decryption is applied (or skipped, for /Identity) by
    # PdfDocument.decode before the cascade runs — no-op here (§7.4.10)
    "Crypt": lambda data, p: data,
}


def decode_stream(stream: Stream, resolve=None) -> bytes:
    """Apply the full filter cascade to a stream's raw bytes.

    ``resolve`` dereferences indirect Filter/DecodeParms values.
    Reference driver: `src/filter/mod.rs:17-63`.
    """
    res = resolve if resolve is not None else (lambda x: x)
    if stream.dict.get("F") is not None:
        # /F names an EXTERNAL file holding the real data (with /FFilter/
        # /FDecodeParms applying to it, §7.3.8.2; reference:
        # `src/stream.rs:61-110`). A crawl corpus has no filesystem
        # neighbors — surface the stable soft error instead of decoding
        # the (per spec, ignorable) inline bytes as if they were the data.
        raise PdfError("external-stream", "stream data lives in /F file")
    filters = res(stream.dict.get("Filter"))
    parms = res(stream.dict.get("DecodeParms", stream.dict.get("DP")))
    data = bytes(stream.data)
    if filters is None:
        return data
    if isinstance(filters, (str, Name)):
        filters = [filters]
    # normalize DecodeParms to exactly len(filters) entries: writers emit
    # a bare dict for one filter, a 1-list for one filter, or a short
    # list for a cascade — all must line up, never silently drop
    if isinstance(parms, list):
        parms = list(parms) + [None] * (len(filters) - len(parms))
    else:
        parms = [parms] + [None] * (len(filters) - 1)
    for f, p in zip(filters, parms):
        fname = _ABBREV.get(str(res(f)), str(res(f)))
        p = res(p) or {}
        if not isinstance(p, dict):
            p = {}
        else:
            p = {k: res(v) for k, v in p.items()}
        if fname in IMAGE_FILTERS:
            return data  # terminal image payload
        dec = _DECODERS.get(fname)
        if dec is None:
            raise PdfError("filter", f"unknown filter {fname}")
        data = dec(data, p)
    return data

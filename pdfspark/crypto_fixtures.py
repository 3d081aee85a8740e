"""Encrypted-PDF fixture builder (independent encryptor twin of the
kernel's SecurityHandler, per PDF 32000 §7.6.3 algorithms 2-5)."""

from __future__ import annotations

import hashlib

from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show
from pdfspark.docgen import _escape
from pdfspark.kernel.encryption import (
    SecurityHandler,
    compute_encryption_key,
    compute_o_entry,
    compute_u_entry,
    rc4,
)


def build_encrypted_pdf(text: str, cfm: str = "rc4",
                        user_password: bytes = b"",
                        strf_identity: bool = False,
                        title: str = None) -> bytes:
    """One-page doc, streams+strings encrypted.

    rc4 → V=2 R=3 Length=128;  aesv2 → V=4 R=4 StdCF/AESV2;
    aesv3 → V=5 R=6 StdCF/AESV3 (SHA-2 KDF, 256-bit file key).
    A non-empty ``user_password`` produces a document the empty-password
    kernel must REJECT with error='encrypted'.

    ``strf_identity`` (aesv2 only) writes /StrF /Identity so strings stay
    CLEARTEXT while streams are AES-encrypted (§7.6.5 differing crypt
    filters); ``title`` adds an /Info /Title string in the string context.
    """
    if cfm == "aesv3":
        return _build_aesv3_pdf(text, user_password)
    revision = 4 if cfm == "aesv2" else 3
    v = 4 if cfm == "aesv2" else 2
    key_len = 16
    file_id0 = hashlib.md5(b"pdfspark-fixture-id").digest()
    p = -44
    o_entry = compute_o_entry(user_password, user_password, revision, key_len)
    key = compute_encryption_key(o_entry, p, file_id0, revision, key_len,
                                 True, user_password=user_password)
    u_entry = compute_u_entry(key, file_id0, revision)
    handler = SecurityHandler(key, cfm, revision)

    content = _simple_show(text).encode("latin-1")
    content_num = 2
    enc_content = handler.encrypt(content, content_num, 0)

    b = PdfBuilder()
    b.add(BASE14, num=1)
    b.add(
        f"<< /Length {len(enc_content)} >>\nstream\n".encode("latin-1")
        + enc_content
        + b"\nendstream",
        num=content_num,
    )
    b.add(
        "<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>",
        num=3,
    )
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>", num=90)
    b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    if cfm == "aesv2":
        strf = "/Identity" if strf_identity else "/StdCF"
        enc_src = (
            "<< /Filter /Standard /V 4 /R 4 /Length 128 "
            "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> "
            f"/StmF /StdCF /StrF {strf} "
            f"/O <{o_entry.hex()}> /U <{u_entry[:32].hex()}> /P {p} >>"
        )
    else:
        enc_src = (
            "<< /Filter /Standard /V 2 /R 3 /Length 128 "
            f"/O <{o_entry.hex()}> /U <{u_entry[:32].hex()}> /P {p} >>"
        )
    enc_num = b.add(enc_src, num=50)
    trailer_extra = (
        f" /Encrypt {enc_num} 0 R"
        f" /ID [<{file_id0.hex()}> <{file_id0.hex()}>]"
    )
    if title is not None:
        info_num = 60
        tb = title.encode("latin-1")
        enc_tb = tb if strf_identity else handler.encrypt(tb, info_num, 0)
        b.add(b"<< /Title <" + enc_tb.hex().encode() + b"> >>", num=info_num)
        trailer_extra += f" /Info {info_num} 0 R"
    return b.build(91, trailer_extra=trailer_extra)


def build_crypt_identity_pdf(text: str) -> bytes:
    """AESV2-encrypted document whose content stream opts OUT of
    encryption via a /Crypt filter with /Name /Identity (§7.4.10): the
    stream body is stored cleartext and must be decoded as-is."""
    revision, key_len = 4, 16
    file_id0 = hashlib.md5(b"pdfspark-fixture-id").digest()
    p = -44
    o_entry = compute_o_entry(b"", b"", revision, key_len)
    key = compute_encryption_key(o_entry, p, file_id0, revision, key_len, True)
    u_entry = compute_u_entry(key, file_id0, revision)

    content = _simple_show(text).encode("latin-1")  # NOT encrypted
    b = PdfBuilder()
    b.add(BASE14, num=1)
    b.add(
        (
            f"<< /Length {len(content)} /Filter /Crypt "
            "/DecodeParms << /Type /CryptFilterDecodeParms /Name /Identity >>"
            " >>\nstream\n"
        ).encode("latin-1")
        + content + b"\nendstream",
        num=2,
    )
    b.add(
        "<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>",
        num=3,
    )
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>", num=90)
    b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    enc_num = b.add(
        "<< /Filter /Standard /V 4 /R 4 /Length 128 "
        "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> "
        "/StmF /StdCF /StrF /StdCF "
        f"/O <{o_entry.hex()}> /U <{u_entry[:32].hex()}> /P {p} >>",
        num=50,
    )
    return b.build(91, trailer_extra=(
        f" /Encrypt {enc_num} 0 R"
        f" /ID [<{file_id0.hex()}> <{file_id0.hex()}>]"
    ))


def build_named_crypt_pdf(text: str, name: str = "RC4CF") -> bytes:
    """AESV2-as-StmF document whose content stream instead names a second
    crypt filter via ``/Filter /Crypt /Name /RC4CF`` (§7.4.10): the body is
    RC4-encrypted with RC4CF's key, NOT AES with the StmF default. A reader
    that ignores the /Name and applies StmF produces garbage. Passing a
    ``name`` absent from /CF exercises the stable soft-error path."""
    import struct as _s

    revision, key_len = 4, 16
    file_id0 = hashlib.md5(b"pdfspark-fixture-id").digest()
    p = -44
    o_entry = compute_o_entry(b"", b"", revision, key_len)
    key = compute_encryption_key(o_entry, p, file_id0, revision, key_len, True)
    u_entry = compute_u_entry(key, file_id0, revision)

    content = _simple_show(text).encode("latin-1")
    # RC4 object key for (obj 2, gen 0) at the RC4CF length (128-bit)
    okey = hashlib.md5(
        key + _s.pack("<I", 2)[:3] + _s.pack("<I", 0)[:2]
    ).digest()[:16]
    enc_content = rc4(okey, content)
    b = PdfBuilder()
    b.add(BASE14, num=1)
    b.add(
        (
            f"<< /Length {len(enc_content)} /Filter /Crypt "
            f"/DecodeParms << /Type /CryptFilterDecodeParms /Name /{name} >>"
            " >>\nstream\n"
        ).encode("latin-1")
        + enc_content + b"\nendstream",
        num=2,
    )
    b.add(
        "<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>",
        num=3,
    )
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>", num=90)
    b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    enc_num = b.add(
        "<< /Filter /Standard /V 4 /R 4 /Length 128 "
        "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> "
        "/RC4CF << /CFM /V2 /Length 128 /AuthEvent /DocOpen >> >> "
        "/StmF /StdCF /StrF /StdCF "
        f"/O <{o_entry.hex()}> /U <{u_entry[:32].hex()}> /P {p} >>",
        num=50,
    )
    return b.build(91, trailer_extra=(
        f" /Encrypt {enc_num} 0 R"
        f" /ID [<{file_id0.hex()}> <{file_id0.hex()}>]"
    ))


def build_encmeta_false_pdf(text: str, xmp: bytes) -> bytes:
    """V=4 R=4 CFM V2 (RC4) with /EncryptMetadata false: the document XMP
    metadata stream is stored CLEARTEXT (§7.6.3.2) and must not be
    'decrypted' into garbage."""
    revision, key_len = 4, 16
    file_id0 = hashlib.md5(b"pdfspark-fixture-id").digest()
    p = -44
    o_entry = compute_o_entry(b"", b"", revision, key_len)
    key = compute_encryption_key(o_entry, p, file_id0, revision, key_len,
                                 False)  # em=False changes the KDF
    u_entry = compute_u_entry(key, file_id0, revision)
    handler = SecurityHandler(key, "rc4", revision)

    content = _simple_show(text).encode("latin-1")
    enc_content = handler.encrypt(content, 2, 0)
    b = PdfBuilder()
    b.add(BASE14, num=1)
    b.add(
        f"<< /Length {len(enc_content)} >>\nstream\n".encode("latin-1")
        + enc_content + b"\nendstream",
        num=2,
    )
    b.add(
        "<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>",
        num=3,
    )
    b.add(  # cleartext XMP stream
        (
            f"<< /Type /Metadata /Subtype /XML /Length {len(xmp)} >>"
            "\nstream\n"
        ).encode("latin-1") + xmp + b"\nendstream",
        num=4,
    )
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>", num=90)
    b.add("<< /Type /Catalog /Pages 90 0 R /Metadata 4 0 R >>", num=91)
    enc_num = b.add(
        "<< /Filter /Standard /V 4 /R 4 /Length 128 "
        "/CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen >> >> "
        "/StmF /StdCF /StrF /StdCF /EncryptMetadata false "
        f"/O <{o_entry.hex()}> /U <{u_entry[:32].hex()}> /P {p} >>",
        num=50,
    )
    return b.build(91, trailer_extra=(
        f" /Encrypt {enc_num} 0 R"
        f" /ID [<{file_id0.hex()}> <{file_id0.hex()}>]"
    ))


def build_encrypted_objstm_pdf(text: str, title: str = "ObjStm Title",
                               cfm: str = "rc4") -> bytes:
    """Encrypted PDF 1.5/1.6 shape: catalog/pages/page/Info packed into an
    OBJECT STREAM whose container is itself encrypted (decrypt → inflate),
    cross-referenced by an (unencrypted, §7.5.8.2) XREF STREAM with type-2
    entries. Pins two subtle behaviors at once: the objstm container
    decrypts with its own object key, and strings INSIDE an object stream
    are NOT individually encrypted (§7.5.7) — the /Info /Title must come
    out readable without a second decryption pass. ``cfm``: 'rc4' (V=2,
    the PDF 1.5 shape) or 'aesv2' (V=4 StdCF, the modern 1.6+ shape where
    encryption changes stream LENGTHS via IV+padding)."""
    import struct as _s
    import zlib as _z

    revision = 4 if cfm == "aesv2" else 3
    key_len = 16
    file_id0 = hashlib.md5(b"pdfspark-objstm-id").digest()
    p = -44
    o_entry = compute_o_entry(b"", b"", revision, key_len)
    key = compute_encryption_key(o_entry, p, file_id0, revision, key_len, True)
    u_entry = compute_u_entry(key, file_id0, revision)
    handler = SecurityHandler(key, cfm, revision)

    # obj 2: content stream — RC4 with (2, 0)'s key
    content = _simple_show(text).encode("latin-1")
    enc_content = handler.encrypt(content, 2, 0)

    # objs 3/4/5/9 live inside object stream 6
    inner = [
        (3, b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>"),
        (4, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (5, b"<< /Type /Catalog /Pages 4 0 R >>"),
        (9, b"<< /Title (" + _escape(title).encode("latin-1") + b") >>"),
    ]
    bodies = bytearray()
    pairs = []
    for num, body in inner:
        pairs.append(f"{num} {len(bodies)}")
        bodies += body + b" "
    header = (" ".join(pairs) + " ").encode("latin-1")
    payload = header + bytes(bodies)
    enc_objstm = handler.encrypt(_z.compress(payload, 6), 6, 0)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    emit(1, BASE14.encode("latin-1") if isinstance(BASE14, str) else BASE14)
    emit(2, b"<< /Length %d >>\nstream\n" % len(enc_content)
            + enc_content + b"\nendstream")
    emit(6, b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode"
            b" /Length %d >>\nstream\n"
            % (len(inner), len(header), len(enc_objstm))
            + enc_objstm + b"\nendstream")
    if cfm == "aesv2":
        enc_src = (
            "<< /Filter /Standard /V 4 /R 4 /Length 128 "
            "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> "
            "/StmF /StdCF /StrF /StdCF "
            f"/O <{o_entry.hex()}> /U <{u_entry[:32].hex()}> /P {p} >>"
        )
    else:
        enc_src = (
            "<< /Filter /Standard /V 2 /R 3 /Length 128 "
            f"/O <{o_entry.hex()}> /U <{u_entry[:32].hex()}> /P {p} >>"
        )
    emit(7, enc_src.encode("latin-1"))

    # xref STREAM (obj 8): W [1 4 2]; type-2 rows point into objstm 6
    xref_off = len(out)
    rows = [
        (0, 0, 65535),                 # 0: free
        (1, offsets[1], 0),
        (1, offsets[2], 0),
        (2, 6, 0),                     # 3 → objstm 6 idx 0
        (2, 6, 1),
        (2, 6, 2),
        (1, offsets[6], 0),
        (1, offsets[7], 0),
        (1, xref_off, 0),              # 8: the xref stream itself
        (2, 6, 3),                     # 9 → objstm 6 idx 3 (Info)
    ]
    data = b"".join(
        _s.pack(">B", t) + _s.pack(">I", a) + _s.pack(">H", b_)
        for t, a, b_ in rows
    )
    xdata = _z.compress(data, 6)  # xref streams are NEVER encrypted
    emit(8, (
        "<< /Type /XRef /Size 10 /W [1 4 2] /Root 5 0 R /Info 9 0 R "
        f"/Encrypt 7 0 R /ID [<{file_id0.hex()}> <{file_id0.hex()}>] "
        f"/Filter /FlateDecode /Length {len(xdata)} >>\n"
    ).encode("latin-1") + b"stream\n" + xdata + b"\nendstream")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(out)


def _build_aesv3_pdf(text: str, user_password: bytes = b"") -> bytes:
    """V=5 R=6 encryptor (Algorithm 2.B KDF, AES-256-CBC body)."""
    from pdfspark.kernel.encryption import _aes_cbc_nopad, r6_hash

    vsalt = hashlib.md5(b"vsalt").digest()[:8]
    ksalt = hashlib.md5(b"ksalt").digest()[:8]
    file_key = hashlib.sha256(b"pdfspark-aesv3-file-key").digest()
    u_entry = r6_hash(user_password, vsalt) + vsalt + ksalt
    ue_entry = _aes_cbc_nopad(
        r6_hash(user_password, ksalt), b"\x00" * 16, file_key, encrypt=True
    )
    handler = SecurityHandler(file_key, "aesv3", 6)

    content = _simple_show(text).encode("latin-1")
    enc_content = handler.encrypt(content, 2, 0)
    b = PdfBuilder()
    b.add(BASE14, num=1)
    b.add(
        f"<< /Length {len(enc_content)} >>\nstream\n".encode("latin-1")
        + enc_content + b"\nendstream",
        num=2,
    )
    b.add(
        "<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>",
        num=3,
    )
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>", num=90)
    b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    enc_num = b.add(
        "<< /Filter /Standard /V 5 /R 6 /Length 256 "
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> "
        "/StmF /StdCF /StrF /StdCF "
        f"/U <{u_entry.hex()}> /UE <{ue_entry.hex()}> "
        f"/O <{bytes(48).hex()}> /OE <{bytes(32).hex()}> "
        f"/Perms <{bytes(16).hex()}> /P -44 >>",
        num=50,
    )
    return b.build(91, trailer_extra=f" /Encrypt {enc_num} 0 R /ID [<00> <00>]")


def build_unsupported_encrypted_pdf() -> bytes:
    """AESV3/R6 (password-derived SHA-256 handler) — out of scope; the
    kernel must emit error='encrypted' without crashing."""
    b = PdfBuilder()
    b.add(BASE14, num=1)
    b.add_stream("<< >>", _simple_show("secret").encode(), num=2)
    b.add(
        "<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>",
        num=3,
    )
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>", num=90)
    b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    enc = b.add(
        "<< /Filter /Standard /V 5 /R 6 /Length 256 "
        "/O (0000000000000000000000000000000000000000000) "
        "/U (0000000000000000000000000000000000000000000) /P -44 >>",
        num=50,
    )
    return b.build(91, trailer_extra=f" /Encrypt {enc} 0 R /ID [<00> <00>]")

"""Encrypted-PDF fixture builder (independent encryptor twin of the
kernel's SecurityHandler, per PDF 32000 §7.6.3 algorithms 2-5)."""

from __future__ import annotations

import hashlib

from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show
from pdfspark.kernel.encryption import (
    SecurityHandler,
    compute_encryption_key,
    compute_o_entry,
    compute_u_entry,
)


def build_encrypted_pdf(text: str, cfm: str = "rc4") -> bytes:
    """One-page doc, empty user+owner passwords, streams+strings encrypted.

    rc4 → V=2 R=3 Length=128;  aesv2 → V=4 R=4 StdCF/AESV2.
    """
    revision = 4 if cfm == "aesv2" else 3
    v = 4 if cfm == "aesv2" else 2
    key_len = 16
    file_id0 = hashlib.md5(b"pdfspark-fixture-id").digest()
    p = -44
    o_entry = compute_o_entry(b"", b"", revision, key_len)
    key = compute_encryption_key(o_entry, p, file_id0, revision, key_len, True)
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
    enc_num = b.add(enc_src, num=50)
    trailer_extra = (
        f" /Encrypt {enc_num} 0 R"
        f" /ID [<{file_id0.hex()}> <{file_id0.hex()}>]"
    )
    return b.build(91, trailer_extra=trailer_extra)


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

"""Standard security handler: key derivation, RC4/AESV2 roundtrips,
empty-password authentication, string decryption."""

import pytest

from pdfspark.crypto_fixtures import build_encrypted_pdf
from pdfspark.kernel.document import PdfDocument
from pdfspark.kernel.encryption import (
    PAD,
    SecurityHandler,
    compute_encryption_key,
    compute_o_entry,
    compute_u_entry,
    rc4,
)
from pdfspark.kernel.extract import extract_text
from pdfspark.kernel.objects import PdfError


def test_rc4_known_vector():
    # RFC 6229-style check: RC4("Key", "Plaintext")
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"


def test_rc4_symmetric():
    data = bytes(range(256))
    assert rc4(b"k" * 16, rc4(b"k" * 16, data)) == data


def test_empty_password_auth_roundtrip():
    for rev in (2, 3):
        o = compute_o_entry(b"", b"", rev, 16)
        key = compute_encryption_key(o, -44, b"fileid", rev, 16)
        u = compute_u_entry(key, b"fileid", rev)
        # the handler's own check: recompute and compare
        n = 16 if rev >= 3 else 32
        assert compute_u_entry(key, b"fileid", rev)[:n] == u[:n]


def test_wrong_password_rejected():
    o = compute_o_entry(b"", b"hunter2", 3, 16)
    key = compute_encryption_key(o, -44, b"fileid", 3, 16,
                                 user_password=b"hunter2")
    u = compute_u_entry(key, b"fileid", 3)
    enc = {
        "Filter": "Standard", "V": 2, "R": 3, "Length": 128,
        "O": o, "U": u[:32], "P": -44,
    }
    with pytest.raises(PdfError) as e:
        SecurityHandler.from_encrypt_dict(enc, b"fileid", lambda x: x)
    assert e.value.code == "encrypted"


@pytest.mark.parametrize("cfm", ["rc4", "aesv2"])
def test_encrypted_document_string_decryption(cfm):
    pdf = build_encrypted_pdf("hello crypt", cfm=cfm)
    doc = PdfDocument(pdf)
    assert doc.security is not None
    assert doc.security.cfm == cfm
    r = extract_text(pdf)
    assert r.text == "hello crypt"
    assert r.error is None


def test_aes_stream_is_actually_ciphertext():
    pdf = build_encrypted_pdf("visible text marker", cfm="aesv2")
    assert b"visible text marker" not in pdf
    pdf2 = build_encrypted_pdf("visible text marker", cfm="rc4")
    assert b"visible text marker" not in pdf2


def test_r6_hash_deterministic_and_salt_sensitive():
    from pdfspark.kernel.encryption import r6_hash

    a = r6_hash(b"", b"saltsalt")
    assert len(a) == 32
    assert a == r6_hash(b"", b"saltsalt")
    assert a != r6_hash(b"", b"othersal")
    assert a != r6_hash(b"pw", b"saltsalt")


def test_aesv3_document_roundtrip_and_rejection():
    pdf = build_encrypted_pdf("v5 text", cfm="aesv3")
    r = extract_text(pdf)
    assert r.text == "v5 text" and r.error is None
    locked = build_encrypted_pdf("v5 text", cfm="aesv3",
                                 user_password=b"secret")
    r2 = extract_text(locked)
    assert r2.error == "encrypted" and r2.text is None
    # ciphertext really is opaque
    assert b"v5 text" not in pdf

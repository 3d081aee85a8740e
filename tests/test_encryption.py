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


def test_strf_identity_keeps_strings_cleartext():
    """/StrF /Identity with /StmF /StdCF (AESV2): streams decrypt, strings
    pass through untouched — a single shared CFM would garble the title."""
    pdf = build_encrypted_pdf("body text", cfm="aesv2",
                              strf_identity=True, title="Clear Title")
    doc = PdfDocument(pdf)
    assert doc.security.cfm == "aesv2"
    assert doc.security.str_cfm == "identity"
    r = extract_text(pdf)
    assert r.text == "body text" and r.error is None
    assert r.title == "Clear Title"


def test_strf_stdcf_still_decrypts_title():
    pdf = build_encrypted_pdf("body text", cfm="aesv2", title="Enc Title")
    assert b"Enc Title" not in pdf  # string context really is encrypted
    r = extract_text(pdf)
    assert r.text == "body text" and r.title == "Enc Title"


def test_crypt_identity_stream_not_decrypted():
    """A /Crypt filter with /Name /Identity opts the stream out of the
    document handler: the cleartext body must decode as-is."""
    from pdfspark.crypto_fixtures import build_crypt_identity_pdf

    pdf = build_crypt_identity_pdf("opted out")
    r = extract_text(pdf)
    assert r.text == "opted out" and r.error is None


def test_named_crypt_filter_uses_its_own_cf_entry():
    """A /Crypt filter naming a NON-Identity CF entry must decrypt with
    that entry's method+key (§7.4.10), not the StmF default: here the body
    is RC4 under /RC4CF while StmF is AESV2."""
    from pdfspark.crypto_fixtures import build_named_crypt_pdf

    pdf = build_named_crypt_pdf("named filter body")
    doc = PdfDocument(pdf)
    assert doc.security.cfm == "aesv2"  # StmF default really is AES
    assert doc.security.cf_keys["RC4CF"][0] == "rc4"
    r = extract_text(pdf)
    assert r.text == "named filter body" and r.error is None


def test_unknown_named_crypt_filter_soft_errors():
    """A /Crypt /Name absent from /CF must surface a stable soft error —
    never a silent mis-decrypt with the default stream key."""
    from pdfspark.crypto_fixtures import build_named_crypt_pdf

    pdf = build_named_crypt_pdf("x", name="NoSuchCF")
    r = extract_text(pdf)
    assert r.error == "encrypted"


def test_v4_mixed_cf_key_lengths():
    """V=4 with StmF CFM=V2 at Length 40 and StrF=AESV2: each context must
    derive its own file key at its own length (the R≥3 rehash loop is
    length-dependent) — AES presence must not force the RC4 side to 16."""
    from pdfspark.kernel.encryption import (
        SecurityHandler,
        compute_encryption_key,
        compute_o_entry,
        compute_u_entry,
    )
    from pdfspark.kernel.objects import Name

    file_id0 = b"\x01" * 16
    p = -44
    o = compute_o_entry(b"", b"", 4, 5)
    key5 = compute_encryption_key(o, p, file_id0, 4, 5, True)
    u = compute_u_entry(key5, file_id0, 4)
    enc = {
        "Filter": Name("Standard"), "V": 4, "R": 4, "Length": 40,
        "CF": {"StmCF": {"CFM": Name("V2")}, "StrCF": {"CFM": Name("AESV2")}},
        "StmF": Name("StmCF"), "StrF": Name("StrCF"),
        "O": o, "U": u, "P": p,
    }
    h = SecurityHandler.from_encrypt_dict(enc, file_id0, lambda x: x)
    assert h.cfm == "rc4" and len(h.key) == 5
    assert h.str_cfm == "aesv2" and len(h.str_key) == 16
    assert h.key == key5  # the 40-bit side really derives at 40 bits
    assert h.cf_keys["StmCF"] == ("rc4", key5)
    assert h.cf_keys["StrCF"][0] == "aesv2"


def test_encrypt_metadata_false_keeps_xmp_cleartext():
    from pdfspark.crypto_fixtures import build_encmeta_false_pdf
    from pdfspark.kernel.objects import Reference, Stream

    xmp = b"<?xpacket begin=''?><x:xmpmeta/><?xpacket end='w'?>"
    pdf = build_encmeta_false_pdf("meta body", xmp)
    doc = PdfDocument(pdf)
    assert doc.security is not None and not doc.security.encrypt_metadata
    meta = doc.get_object(Reference(4, 0))
    assert isinstance(meta, Stream)
    assert doc.decode(meta) == xmp  # NOT rc4-garbled
    r = extract_text(pdf)
    assert r.text == "meta body" and r.error is None


def test_encrypted_object_stream_roundtrip():
    """PDF 1.5+ encrypted shape: the objstm container decrypts with its
    own object key before inflating; objects inside it lex normally; and
    strings INSIDE the object stream are NOT individually decrypted
    (§7.5.7 — the container encryption already covered them), so the
    /Info /Title reads back exactly."""
    from pdfspark.crypto_fixtures import build_encrypted_objstm_pdf

    pdf = build_encrypted_objstm_pdf("inner body", title="Clear Inside")
    assert b"inner body" not in pdf and b"Clear Inside" not in pdf
    r = extract_text(pdf)
    assert r.text == "inner body" and r.error is None
    assert r.title == "Clear Inside"
    assert r.n_pages == 1


def test_aes_encrypted_object_stream_roundtrip():
    """The modern PDF 1.6+ shape: AESV2-encrypted objstm container (IV +
    PKCS padding change the stream LENGTH, unlike RC4) behind an
    unencrypted xref stream — decrypt strips IV/padding, inflate yields
    the object bodies, inner strings stay single-encrypted."""
    from pdfspark.crypto_fixtures import build_encrypted_objstm_pdf

    pdf = build_encrypted_objstm_pdf("aes inner body", title="AES Inside",
                                     cfm="aesv2")
    assert b"aes inner body" not in pdf and b"AES Inside" not in pdf
    r = extract_text(pdf)
    assert r.text == "aes inner body" and r.error is None
    assert r.title == "AES Inside"


def test_v4_malformed_cf_length_falls_back_to_doc_length():
    """ADVICE r3 #4: a CF /Length outside both plausible encodings
    (5-16 bytes, 40-128 bits — e.g. 24) must fall back to the
    encrypt-dict /Length rather than clamp to 16 bytes; clamping
    mis-derives that CF's keys and decrypts streams to garbage."""
    from pdfspark.kernel.encryption import (
        SecurityHandler,
        compute_encryption_key,
        compute_o_entry,
        compute_u_entry,
    )
    from pdfspark.kernel.objects import Name

    file_id0 = b"\x02" * 16
    p = -44
    o = compute_o_entry(b"", b"", 4, 5)
    key5 = compute_encryption_key(o, p, file_id0, 4, 5, True)
    u = compute_u_entry(key5, file_id0, 4)
    enc = {
        "Filter": Name("Standard"), "V": 4, "R": 4, "Length": 40,
        "CF": {"StmCF": {"CFM": Name("V2"), "Length": 24}},
        "StmF": Name("StmCF"), "StrF": Name("Identity"),
        "O": o, "U": u, "P": p,
    }
    h = SecurityHandler.from_encrypt_dict(enc, file_id0, lambda x: x)
    # doc /Length 40 bits → 5-byte key, NOT the clamped 16-byte key
    assert h.cfm == "rc4" and len(h.key) == 5
    assert h.key == key5
    assert h.cf_keys["StmCF"] == ("rc4", key5)

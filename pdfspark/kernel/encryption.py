"""Standard security handler (SURVEY.md §2A.4 E1; PDF 32000 §7.6).

Coverage: V=1/2 (RC4 40-128 bit), V=4 with StdCF CFM /V2 (RC4) or /AESV2
(AES-128-CBC via the `cryptography` package, import-gated), revisions
2/3/4, EMPTY user password only — the only case a crawl pipeline can
decrypt without side-channel secrets. Anything else raises
``PdfError('encrypted')`` and lands in the error column.

The reference implements the same key derivation + AESV2 stream decrypt
(`src/encryption.rs:240-336`) but leaves ``decrypt_string`` as ``todo!()``
and lacks RC4; both are complete here.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

from pdfspark.kernel.objects import Name, PdfError, Stream

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )
    except ImportError:
        raise PdfError("encrypted", "AES support unavailable")
    if len(data) < 16:
        return b""
    iv, body = data[:16], data[16:]
    if len(body) % 16:
        body = body[: len(body) - len(body) % 16]
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    plain = dec.update(body) + dec.finalize()
    if plain and 1 <= plain[-1] <= 16:  # PKCS#5 padding
        plain = plain[: -plain[-1]]
    return plain


def compute_encryption_key(
    o_entry: bytes,
    p: int,
    file_id0: bytes,
    revision: int,
    key_len: int,
    encrypt_metadata: bool = True,
    user_password: bytes = b"",
) -> bytes:
    """Algorithm 2: file encryption key from the (padded) user password."""
    padded = (user_password + PAD)[:32]
    h = hashlib.md5()
    h.update(padded)
    h.update(o_entry[:32])
    # /P is nominally signed but many writers emit the unsigned 32-bit
    # form; the MD5 input bytes are identical either way
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(file_id0)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def compute_o_entry(owner_pw: bytes, user_pw: bytes, revision: int,
                    key_len: int) -> bytes:
    """Algorithm 3 (used by the fixture *encryptor*)."""
    padded_owner = ((owner_pw or user_pw) + PAD)[:32]
    h = hashlib.md5(padded_owner).digest()
    if revision >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4_key = h[:key_len]
    out = rc4(rc4_key, (user_pw + PAD)[:32])
    if revision >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in rc4_key), out)
    return out


def compute_u_entry(key: bytes, file_id0: bytes, revision: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R≥3)."""
    if revision == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + file_id0).digest()
    out = rc4(key, h)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in key), out)
    return out + b"\x00" * 16


def _aes_cbc_nopad(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    ctx = c.encryptor() if encrypt else c.decryptor()
    return ctx.update(data) + ctx.finalize()


def r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (PDF 2.0 / ISO 32000-2): the iterated SHA-2 KDF for
    revision 6."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_nopad(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class SecurityHandler:
    """Per-document decryption context (empty user password)."""

    __slots__ = ("key", "key_len", "cfm", "str_cfm", "revision",
                 "encrypt_metadata", "str_key", "cf_keys")

    def __init__(self, key: bytes, cfm: str, revision: int,
                 str_cfm: str = None, encrypt_metadata: bool = True,
                 str_key: bytes = None, cf_keys: dict = None) -> None:
        self.key = key
        self.key_len = len(key)
        self.cfm = cfm  # stream context: 'rc4' | 'aesv2' | 'aesv3' | 'identity'
        # string context may use a DIFFERENT crypt filter (/StrF vs /StmF,
        # PDF 32000 §7.6.5) — e.g. StrF=Identity with StmF=AESV2; each CF
        # entry may also carry its own /Length, so the contexts can hold
        # DIFFERENT file keys (the R≥3 rehash loop depends on key length)
        self.str_cfm = cfm if str_cfm is None else str_cfm
        self.str_key = key if str_key is None else str_key
        # per-crypt-filter-name (method, file key): streams may override
        # the StmF default with /Filter /Crypt /Name X (§7.4.10)
        self.cf_keys: dict = cf_keys if cf_keys is not None else {}
        self.revision = revision
        self.encrypt_metadata = encrypt_metadata

    @classmethod
    def from_encrypt_dict(cls, enc: dict, file_id0: bytes,
                          resolve) -> "SecurityHandler":
        filt = str(resolve(enc.get("Filter")) or "")
        if filt != "Standard":
            raise PdfError("encrypted", f"unsupported handler {filt}")
        v = int(resolve(enc.get("V", 0)) or 0)
        r = int(resolve(enc.get("R", 2)) or 2)
        length = int(resolve(enc.get("Length", 40)) or 40)
        cfm = "rc4"
        if v == 5:
            # AESV3 (PDF 2.0, R5/R6): SHA-2 KDF, 256-bit file key used
            # directly (no per-object salt)
            u = resolve(enc.get("U"))
            ue = resolve(enc.get("UE"))
            if not isinstance(u, bytes) or not isinstance(ue, bytes) \
                    or len(u) < 48 or len(ue) < 32:
                raise PdfError("encrypted", "malformed V5 U/UE entries")
            vsalt, ksalt = u[32:40], u[40:48]
            if r >= 6:
                check = r6_hash(b"", vsalt)
                ikey = r6_hash(b"", ksalt)
            else:  # R5 (deprecated Adobe extension): single SHA-256
                check = hashlib.sha256(b"" + vsalt).digest()
                ikey = hashlib.sha256(b"" + ksalt).digest()
            if check != u[:32]:
                raise PdfError("encrypted", "password required")
            file_key = _aes_cbc_nopad(ikey, b"\x00" * 16, bytes(ue[:32]),
                                      encrypt=False)
            em5 = resolve(enc.get("EncryptMetadata"))
            cf5 = resolve(enc.get("CF"))
            cf_keys5 = {"Identity": ("identity", b"")}
            if isinstance(cf5, dict):
                for fname in cf5:  # every V5 crypt filter is AESV3
                    cf_keys5[str(fname)] = ("aesv3", file_key)
            return cls(file_key, "aesv3", r,
                       encrypt_metadata=True if em5 is None else bool(em5),
                       cf_keys=cf_keys5)
        str_cfm = None
        cf_entries: dict = {}
        if v in (1, 2):
            key_len = 5 if v == 1 else max(5, min(16, length // 8))
        elif v == 4:
            cf = resolve(enc.get("CF")) or {}

            def _entry(filter_name: str):
                """(method, key_len) for one crypt-filter name (§7.6.5).
                Each CF entry may carry its own /Length — bytes per spec,
                bits from many real writers (≥40 ⇒ bits)."""
                if filter_name == "Identity":
                    return ("identity", 0)
                d = resolve(cf.get(filter_name)) if isinstance(cf, dict) else None
                m = str(resolve(d.get("CFM")) if isinstance(d, dict)
                        else "") or ""
                if m == "AESV2":
                    return ("aesv2", 16)  # AES-128: key length is fixed
                if m == "V2":
                    ln = resolve(d.get("Length")) if isinstance(d, dict) else None
                    ln = int(ln) if ln else length
                    # Plausible encodings only: 5-16 is bytes, 40-128 is
                    # bits. A malformed value OUTSIDE both ranges (e.g. 24)
                    # must fall back to the encrypt-dict /Length rather
                    # than clamp — clamping silently mis-derives that CF's
                    # object keys and streams decrypt to garbage instead
                    # of a stable soft error (ADVICE r3 #4).
                    if not (5 <= ln <= 16 or 40 <= ln <= 128):
                        ln = length
                    if ln >= 40:
                        ln //= 8
                    return ("rc4", max(5, min(16, ln)))
                if m in ("None", "Identity"):
                    return ("identity", 0)
                raise PdfError("encrypted", f"unsupported CFM {m}")

            cf_entries = {"Identity": ("identity", 0)}
            if isinstance(cf, dict):
                for fname in cf:
                    cf_entries[str(fname)] = _entry(str(fname))
            stmf = str(resolve(enc.get("StmF", "Identity")) or "Identity")
            strf = str(resolve(enc.get("StrF", "Identity")) or "Identity")
            cfm, stm_len = cf_entries.get(stmf) or _entry(stmf)
            str_cfm, str_len = cf_entries.get(strf) or _entry(strf)
            # primary derivation length: the stream context's own length,
            # falling back to the encrypt-dict /Length
            key_len = stm_len or str_len or max(5, min(16, length // 8))
        else:
            raise PdfError("encrypted", f"unsupported V={v} (AESV3/R5-6)")
        o = resolve(enc.get("O"))
        u = resolve(enc.get("U"))
        p = int(resolve(enc.get("P", -1)) or -1)
        em = resolve(enc.get("EncryptMetadata"))
        em = True if em is None else bool(em)
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("encrypted", "missing O/U entries")

        keys: dict = {}

        def _key_at(klen: int) -> bytes:
            if klen not in keys:
                keys[klen] = compute_encryption_key(o, p, file_id0, r, klen, em)
            return keys[klen]

        key = _key_at(key_len)
        # authenticate the EMPTY user password; if the primary-length key
        # fails, retry the doc-/Length key (writers disagree about which
        # length V=4 uses for Algorithm 2 when CF lengths are mixed)
        doc_len = max(5, min(16, length // 8))
        for cand in (key_len, doc_len):
            expect_u = compute_u_entry(_key_at(cand), file_id0, r)
            got, want = (u[:16], expect_u[:16]) if r >= 3 \
                else (u[:32], expect_u[:32])
            if got == want:
                key = _key_at(cand)
                break
        else:
            raise PdfError("encrypted", "password required")
        cf_keys = {
            name: (meth, _key_at(klen) if meth != "identity" else b"")
            for name, (meth, klen) in cf_entries.items()
        }
        str_key = key if v != 4 or str_cfm == "identity" else _key_at(str_len)
        stm_key = key if v != 4 or cfm == "identity" else _key_at(stm_len)
        return cls(stm_key, cfm, r, str_cfm=str_cfm, encrypt_metadata=em,
                   str_key=str_key, cf_keys=cf_keys)

    def object_key(self, objnum: int, gen: int, cfm: str = None,
                   key: bytes = None) -> bytes:
        cfm = self.cfm if cfm is None else cfm
        key = self.key if key is None else key
        if cfm == "aesv3":
            return key  # V5: the file key is used directly
        h = hashlib.md5()
        h.update(key)
        h.update(struct.pack("<I", objnum)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if cfm == "aesv2":
            h.update(b"sAlT")
        return h.digest()[: min(len(key) + 5, 16)]

    def _apply(self, data: bytes, objnum: int, gen: int, cfm: str,
               key: bytes = None) -> bytes:
        if cfm == "identity":
            return data
        k = self.object_key(objnum, gen, cfm, key)
        if cfm in ("aesv2", "aesv3"):
            return _aes_cbc_decrypt(k, data)
        return rc4(k, data)

    def decrypt(self, data: bytes, objnum: int, gen: int) -> bytes:
        """Stream-context decryption (/StmF crypt filter)."""
        return self._apply(data, objnum, gen, self.cfm, self.key)

    def decrypt_string(self, data: bytes, objnum: int, gen: int) -> bytes:
        """String-context decryption (/StrF crypt filter — may differ)."""
        return self._apply(data, objnum, gen, self.str_cfm, self.str_key)

    def decrypt_named(self, name: str, data: bytes, objnum: int,
                      gen: int) -> bytes:
        """Decrypt with a /Crypt-filter-named CF entry (§7.4.10): a stream
        whose Filter chain carries ``/Crypt /Name X`` uses X's method+key,
        overriding StmF. Unknown names are a stable soft error — never a
        silent mis-decrypt with the default stream key."""
        if name not in self.cf_keys:
            raise PdfError("encrypted", f"unknown crypt filter {name}")
        meth, key = self.cf_keys[name]
        return self._apply(data, objnum, gen, meth, key)

    def encrypt(self, data: bytes, objnum: int, gen: int) -> bytes:
        """Fixture-encryptor twin (RC4 is symmetric; AES needs IV+pad)."""
        k = self.object_key(objnum, gen)
        if self.cfm in ("aesv2", "aesv3"):
            import hashlib as _h

            from cryptography.hazmat.primitives.ciphers import (
                Cipher,
                algorithms,
                modes,
            )

            # deterministic IV derived from plaintext (fixtures only)
            iv = _h.md5(b"iv" + data).digest()
            padlen = 16 - (len(data) % 16)
            body = data + bytes([padlen]) * padlen
            enc = Cipher(algorithms.AES(k), modes.CBC(iv)).encryptor()
            return iv + enc.update(body) + enc.finalize()
        return rc4(k, data)

"""PDF standard security handler: RC4 and AES-128/256 decryption.

Implements the public ISO 32000 / PDF 1.7 algorithms (Algorithm 2 key
derivation, Algorithm 2.A/2.B for revision 5/6, per-object RC4/AES keys)
so documents with an /Encrypt dictionary — ubiquitous in real corpora,
usually with an *empty* user password — decode instead of falling into
recovery/quarantine.

Behavioral reference: the reference's CipherTransformFactory et al.
(/root/reference/src/main/js/pdf.combined.js:24425-26508); independent
Python implementation from the published spec, not a translation.

RC4 is implemented inline (tiny, stdlib-free).  AES uses the container's
``cryptography`` wheel, gated behind an import so the rest of the engine
works without it (RC4-only docs still decrypt).
"""

from __future__ import annotations

import hashlib
import struct

from .objects import Name, PdfError

try:  # AES backend (present in this container); RC4 never needs it
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)
    _HAS_AES = True
except ImportError:  # pragma: no cover
    _HAS_AES = False

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: same function encrypts/decrypts)."""
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


def _aes_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    if not _HAS_AES:
        raise PdfError("AES-encrypted PDF but no AES backend available")
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    ctx = c.encryptor() if encrypt else c.decryptor()
    return ctx.update(data) + ctx.finalize()


def aes_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AES payload: first 16 bytes IV, CBC, PKCS#7 padding."""
    if len(data) < 16:
        return b""
    body = data[16:]
    if not body or len(body) % 16:
        body = body[:len(body) - len(body) % 16]
        if not body:
            return b""
    out = _aes_cbc(key, data[:16], body, encrypt=False)
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return out


def aes_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PDF AES payload: prepend IV, PKCS#7-pad, CBC encrypt."""
    pad = 16 - len(data) % 16
    return iv + _aes_cbc(key, iv, data + bytes([pad]) * pad, encrypt=True)


def _pad_password(pwd: bytes) -> bytes:
    return (pwd[:32] + _PAD)[:32]


def _r6_hash(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (revision 6 hardened hash)."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StandardSecurityHandler:
    """Derives the file key from /Encrypt (empty or given user password)
    and hands out per-object decrypt functions.

    Supported: V1/V2 (RC4 40-128 bit, R2/R3), V4 (R4; crypt filters V2 /
    AESV2 / Identity), V5 (R5/R6; AESV3).
    """

    def __init__(self, enc: dict, id0: bytes, password: bytes = b""):
        self.v = int(enc.get("V") or 0)
        self.r = int(enc.get("R") or 2)
        self.length = int(enc.get("Length") or 40)
        o = _tobytes(enc.get("O"))
        u = _tobytes(enc.get("U"))
        p = int(enc.get("P") or 0) & 0xFFFFFFFF
        self.encrypt_metadata = enc.get("EncryptMetadata", True) is not False
        self.stm_cfm, self.str_cfm = self._crypt_filters(enc)
        if self.v == 5:
            self.key = self._auth_v5(enc, o, u, password)
        else:
            self.key = self._auth_legacy(o, u, p, id0, password)

    def _auth_legacy(self, o: bytes, u: bytes, p: int, id0: bytes,
                     password: bytes) -> bytes:
        key = self._file_key_legacy(o, p, id0, password)
        if self._check_u(key, u, id0):
            return key
        # owner route (Algorithm 7): recover the user password from /O
        n = 5 if self.r == 2 else max(5, min(16, self.length // 8))
        h = hashlib.md5(_pad_password(password)).digest()
        if self.r >= 3:
            for _ in range(50):
                h = hashlib.md5(h).digest()
        okey = h[:n]
        upwd = o
        if self.r == 2:
            upwd = rc4(okey, upwd)
        else:
            for i in range(19, -1, -1):
                upwd = rc4(bytes(b ^ i for b in okey), upwd)
        key = self._file_key_legacy(o, p, id0, upwd.rstrip(b"\x00"))
        if self._check_u(key, u, id0):
            return key
        # some producers write a non-padded recovered password
        key2 = self._file_key_legacy(o, p, id0, upwd)
        if self._check_u(key2, u, id0):
            return key2
        raise PdfError("PDF password incorrect")

    def _check_u(self, key: bytes, u: bytes, id0: bytes) -> bool:
        """Algorithm 6: validate a candidate file key against /U."""
        if self.r == 2:
            return rc4(key, _PAD) == u[:32]
        exp = rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            exp = rc4(bytes(b ^ i for b in key), exp)
        return exp == u[:16]

    # -- key derivation ---------------------------------------------------

    def _file_key_legacy(self, o: bytes, p: int, id0: bytes,
                         password: bytes) -> bytes:
        n = 5 if self.r == 2 else max(5, min(16, self.length // 8))
        h = hashlib.md5()
        h.update(_pad_password(password))
        h.update(o[:32])
        h.update(struct.pack("<I", p))
        h.update(id0)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def _auth_v5(self, enc: dict, o: bytes, u: bytes,
                 password: bytes) -> bytes:
        # user-password route (Algorithm 2.A); empty password is the norm
        vsalt, ksalt = u[32:40], u[40:48]
        if self.r == 6:
            if _r6_hash(password, vsalt) != u[:32]:
                # try the owner route before giving up
                ovsalt, oksalt = o[32:40], o[40:48]
                if _r6_hash(password, ovsalt, u[:48]) == o[:32]:
                    ikey = _r6_hash(password, oksalt, u[:48])
                    oe = _tobytes(enc.get("OE"))
                    return _aes_cbc(ikey, b"\x00" * 16, oe, encrypt=False)
                raise PdfError("PDF password incorrect (R6)")
            ikey = _r6_hash(password, ksalt)
        else:  # r == 5 (deprecated Adobe extension)
            if hashlib.sha256(password + vsalt).digest() != u[:32]:
                raise PdfError("PDF password incorrect (R5)")
            ikey = hashlib.sha256(password + ksalt).digest()
        ue = _tobytes(enc.get("UE"))
        return _aes_cbc(ikey, b"\x00" * 16, ue, encrypt=False)

    def _crypt_filters(self, enc: dict) -> tuple[str, str]:
        if self.v < 4:
            return ("V2", "V2")  # whole-document RC4
        cf = enc.get("CF") or {}

        def method(which):
            name = enc.get(which)
            if name is None or str(name) == "Identity":
                return "Identity"
            f = cf.get(str(name)) or {}
            return str(f.get("CFM") or "Identity")
        return (method("StmF"), method("StrF"))

    # -- per-object decryption --------------------------------------------

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        ext = b"sAlT" if aes else b""
        h = hashlib.md5(self.key + struct.pack("<I", num)[:3]
                        + struct.pack("<I", gen)[:2] + ext).digest()
        return h[:min(len(self.key) + 5, 16)]

    def _apply(self, cfm: str, num: int, gen: int, data: bytes) -> bytes:
        if cfm == "Identity":
            return data
        if cfm == "AESV3" or self.v == 5:
            return aes_decrypt(self.key, data)
        if cfm == "AESV2":
            return aes_decrypt(self._object_key(num, gen, True), data)
        return rc4(self._object_key(num, gen, False), data)

    def decrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        return self._apply(self.stm_cfm, num, gen, data)

    def decrypt_string(self, num: int, gen: int, data: bytes) -> bytes:
        return self._apply(self.str_cfm, num, gen, data)

    # -- encryption (fixture generation / writer support) ------------------

    def encrypt_stream(self, num: int, gen: int, data: bytes,
                       iv: bytes | None = None) -> bytes:
        return self._encrypt(self.stm_cfm, num, gen, data, iv)

    def encrypt_string(self, num: int, gen: int, data: bytes,
                       iv: bytes | None = None) -> bytes:
        return self._encrypt(self.str_cfm, num, gen, data, iv)

    def _encrypt(self, cfm: str, num: int, gen: int, data: bytes,
                 iv: bytes | None) -> bytes:
        if cfm == "Identity":
            return data
        if cfm == "AESV3" or self.v == 5:
            return aes_encrypt(self.key, iv or _det_iv(num, gen), data)
        if cfm == "AESV2":
            return aes_encrypt(self._object_key(num, gen, True),
                               iv or _det_iv(num, gen), data)
        return rc4(self._object_key(num, gen, False), data)


# -- /Encrypt dict generation (fixture/writer support) ----------------------

def generate_legacy_encrypt(user_pwd: bytes, owner_pwd: bytes, p: int,
                            id0: bytes, r: int, length: int,
                            aes: bool) -> dict:
    """Build a V2/V4 /Encrypt dict (Algorithms 2, 3, 4/5 of the spec)."""
    n = 5 if r == 2 else length // 8
    # Algorithm 3: /O
    h = hashlib.md5(_pad_password(owner_pwd or user_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    o = rc4(okey, _pad_password(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key
    hh = hashlib.md5()
    hh.update(_pad_password(user_pwd))
    hh.update(o[:32])
    hh.update(struct.pack("<I", p & 0xFFFFFFFF))
    hh.update(id0)
    key = hh.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    # Algorithm 4/5: /U
    if r == 2:
        u = rc4(key, _PAD)
    else:
        u = rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in key), u)
        u += b"\x00" * 16
    enc = {"Filter": Name("Standard"), "V": 2 if not aes else 4,
           "R": r, "Length": length, "P": p - (1 << 32) if p >= (1 << 31)
           else p, "O": o, "U": u}
    if aes:
        enc["CF"] = {"StdCF": {"CFM": Name("AESV2"), "Length": 16,
                               "AuthEvent": Name("DocOpen")}}
        enc["StmF"] = Name("StdCF")
        enc["StrF"] = Name("StdCF")
    return enc


def generate_v5_encrypt(user_pwd: bytes, owner_pwd: bytes, p: int,
                        seed: bytes = b"fixture") -> dict:
    """Build a V5/R6 (AES-256) /Encrypt dict (Algorithms 8-10)."""
    filekey = hashlib.sha256(b"key:" + seed).digest()
    vsalt = hashlib.md5(b"vs:" + seed).digest()[:8]
    ksalt = hashlib.md5(b"ks:" + seed).digest()[:8]
    u = _r6_hash(user_pwd, vsalt) + vsalt + ksalt
    ue = _aes_cbc(_r6_hash(user_pwd, ksalt), b"\x00" * 16, filekey,
                  encrypt=True)
    ovsalt = hashlib.md5(b"ovs:" + seed).digest()[:8]
    oksalt = hashlib.md5(b"oks:" + seed).digest()[:8]
    opwd = owner_pwd or user_pwd
    o = _r6_hash(opwd, ovsalt, u[:48]) + ovsalt + oksalt
    oe = _aes_cbc(_r6_hash(opwd, oksalt, u[:48]), b"\x00" * 16, filekey,
                  encrypt=True)
    # /Perms: AES-256-ECB of the permissions block (Algorithm 10)
    if not _HAS_AES:  # fixture-generation path still needs a clear error
        raise PdfError("no AES backend: cannot generate V5 /Encrypt")
    pblock = (struct.pack("<I", p & 0xFFFFFFFF) + b"\xff\xff\xff\xff"
              + b"Tadb" + hashlib.md5(b"pr:" + seed).digest()[:4])
    ecb = Cipher(algorithms.AES(filekey), modes.ECB()).encryptor()
    perms = ecb.update(pblock) + ecb.finalize()
    return {"Filter": Name("Standard"), "V": 5, "R": 6, "Length": 256,
            "P": p - (1 << 32) if p >= (1 << 31) else p,
            "O": o, "U": u, "OE": oe, "UE": ue, "Perms": perms,
            "CF": {"StdCF": {"CFM": Name("AESV3"), "Length": 32,
                             "AuthEvent": Name("DocOpen")}},
            "StmF": Name("StdCF"), "StrF": Name("StdCF")}


def _det_iv(num: int, gen: int) -> bytes:
    # deterministic IV for reproducible fixtures (fine for tests; a real
    # writer would use random IVs)
    return hashlib.md5(b"iv:%d:%d" % (num, gen)).digest()


def _tobytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str) and not isinstance(v, Name):
        return v.encode("latin1")
    return b""


def make_handler(enc: dict, trailer_id, password: bytes = b""):
    """Build a handler from a resolved /Encrypt dict + trailer /ID."""
    filt = str(enc.get("Filter") or "")
    if filt and filt != "Standard":
        raise PdfError(f"unsupported security handler {filt!r}")
    id0 = b""
    if isinstance(trailer_id, list) and trailer_id:
        id0 = _tobytes(trailer_id[0])
    return StandardSecurityHandler(enc, id0, password)

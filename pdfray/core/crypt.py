"""RC4 standard-security decryption for PDF (V in {1,2}, R in {2,3}).

Reimplements the reference's supported envelope: Algorithm 2 (encryption key,
`Tokeniser.cs:696-743`), Algorithm 5/6 (U computation + user-password
authentication, `Tokeniser.cs:746-807`), Algorithm 1 per-object keys
(`Tokeniser.cs:1863-1900`), the 32-byte Adobe password pad
(`Tokeniser.cs:1053-1077`) and RC4 itself (`RC4.cs:13-76`, public-domain
algorithm).  Owner-password authentication is a documented reference gap
(`Tokeniser.cs:810-840`).
"""
from __future__ import annotations

import hashlib

PADDING = bytes(
    (
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    )
)


def _rc4_keystream(key: bytes, n: int):
    box = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + box[i] + key[i % klen]) % 256
        box[i], box[j] = box[j], box[i]
    a = 0
    j = 0
    out = bytearray(n)
    for i in range(n):
        a = (a + 1) % 256
        j = (j + box[a]) % 256
        box[a], box[j] = box[j], box[a]
        out[i] = box[(box[a] + box[j]) % 256]
    return out


def rc4(key: bytes, data: bytes) -> bytes:
    """Encrypt/decrypt (symmetric)."""
    ks = _rc4_keystream(key, len(data))
    return bytes(b ^ k for b, k in zip(data, ks))


def rc4_inplace(key: bytes, data: bytearray, offset: int, length: int) -> None:
    """In-place variant used for stream decryption (RC4.cs:13-42)."""
    ks = _rc4_keystream(key, length)
    for i in range(length):
        data[offset + i] ^= ks[i]


def pad_password(password: str) -> bytes:
    """Pad/truncate to 32 bytes with the Adobe padding constant."""
    out = bytearray(32)
    n = min(len(password), 32)
    for i in range(n):
        c = ord(password[i])
        if c < 0x2F or c > 0x7E:
            raise NotImplementedError(
                "Presently, only passwords with ASCII characters are supported, but "
                f"the password {password} had the character'{chr(c)}'."
            )
        out[i] = c
    out[n:] = PADDING[n:]
    return bytes(out)


def _p_bytes(permission: int) -> bytes:
    """P as 4 low-order-first bytes; arithmetic shift matches C# int >>."""
    return bytes(((permission >> (8 * k)) & 0xFF) for k in range(4))


def compute_encryption_key(
    padded_password: bytes,
    o_entry: bytes,
    permission: int,
    trailer_id: bytes,
    length_bytes: int,
) -> bytes:
    """Algorithm 2: MD5 over (padded pw + O + P + ID), then 50 MD5 rounds."""
    digest = hashlib.md5(
        padded_password + o_entry + _p_bytes(permission) + trailer_id
    ).digest()
    key = digest[:length_bytes]
    for _ in range(50):
        key = hashlib.md5(key).digest()[:length_bytes]
    return key


def compute_encrypt_u(padded_password: bytes, encryption_key: bytes, trailer_id: bytes) -> bytes:
    """Algorithm 5: U value (first 16 bytes significant)."""
    data = hashlib.md5(padded_password + trailer_id).digest()
    data = rc4(encryption_key, data)
    for iteration in range(1, 20):
        k = bytes(b ^ iteration for b in encryption_key)
        data = rc4(k, data[:16])
    return data + b"\x00" * (32 - len(data))


def authenticate_user_password(
    padded_password: bytes, encryption_key: bytes, trailer_id: bytes, u_entry: bytes
) -> bool:
    """Algorithm 6: compare computed U to the dictionary's U on 16 bytes."""
    computed = compute_encrypt_u(padded_password, encryption_key, trailer_id)
    return computed[:16] == bytes(u_entry[:16])


def object_encryption_key(global_key: bytes, object_number: int, generation: int) -> bytes:
    """Algorithm 1: key + 3 LSB of objnum + 2 LSB of gen -> MD5, max 16 bytes."""
    data = (
        global_key
        + bytes(
            (
                object_number & 0xFF,
                (object_number >> 8) & 0xFF,
                (object_number >> 16) & 0xFF,
                generation & 0xFF,
                (generation >> 8) & 0xFF,
            )
        )
    )
    digest = hashlib.md5(data).digest()
    n = len(global_key) + 5
    if n < 16:
        return digest[:n]
    return digest

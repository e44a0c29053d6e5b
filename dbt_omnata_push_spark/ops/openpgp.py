"""Minimal RFC 4880 (OpenPGP) message writer + public-key parser.

Implements exactly what the SFMC encrypted upload path needs
(reference: macros/apps/operations/marketing_cloud_data_extension_
upload.sql:87-99 — GPG_PARAMS / GPG_ENCRYPT / GPG_PACKAGE_MESSAGE):
given a recipient's armored RSA public key, produce an armored PGP
message GnuPG can decrypt.

Structure produced (RFC 4880 §4-§5):
    PKESK (tag 1)   v3, RSA-encrypted session key (PKCS#1 v1.5)
    SEIPD (tag 18)  v1, AES-256-CFB, 18-byte prefix, trailing MDC (tag 19)

Primitive math (AES, RSA) comes from the `cryptography` package; every
OpenPGP-specific byte — packet framing, MPIs, CFB prefix, MDC hash,
armor + CRC24 — is implemented here. No proprietary dependencies.

Interoperability is proven in tests/test_gpg_path.py by decrypting the
output with the real GnuPG binary.
"""

from __future__ import annotations

import base64
import hashlib
import os
import struct

_B64_WIDTH = 64

# ---------------------------------------------------------------------------
# Packet framing / armor
# ---------------------------------------------------------------------------


def _new_packet(tag: int, body: bytes) -> bytes:
    """New-format packet header (RFC 4880 §4.2.2)."""
    n = len(body)
    if n < 192:
        length = bytes([n])
    elif n < 8384:
        n -= 192
        length = bytes([(n >> 8) + 192, n & 0xFF])
    else:
        length = b"\xff" + struct.pack(">I", n)
    return bytes([0xC0 | tag]) + length + body


def _mpi(n: int) -> bytes:
    """Multiprecision integer: 2-byte bit count + big-endian magnitude."""
    bits = n.bit_length()
    return struct.pack(">H", bits) + n.to_bytes((bits + 7) // 8, "big")


def _read_mpi(buf: bytes, pos: int) -> tuple[int, int]:
    bits = struct.unpack(">H", buf[pos : pos + 2])[0]
    nbytes = (bits + 7) // 8
    val = int.from_bytes(buf[pos + 2 : pos + 2 + nbytes], "big")
    return val, pos + 2 + nbytes


def _crc24(data: bytes) -> bytes:
    crc = 0xB704CE
    for byte in data:
        crc ^= byte << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= 0x1864CFB
    return (crc & 0xFFFFFF).to_bytes(3, "big")


def armor(data: bytes, kind: str = "MESSAGE") -> str:
    b64 = base64.b64encode(data).decode()
    lines = [b64[i : i + _B64_WIDTH] for i in range(0, len(b64), _B64_WIDTH)]
    crc = base64.b64encode(_crc24(data)).decode()
    return (
        f"-----BEGIN PGP {kind}-----\n\n"
        + "\n".join(lines)
        + f"\n={crc}\n-----END PGP {kind}-----\n"
    )


def unarmor(text: str) -> bytes:
    lines = text.strip().splitlines()
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("-----BEGIN PGP"))
        end = next(i for i, l in enumerate(lines) if l.startswith("-----END PGP"))
    except StopIteration:
        raise ValueError("not an armored OpenPGP block")
    body = lines[start + 1 : end]
    # skip armor headers up to the first blank line, drop the =CRC line
    if "" in body:
        body = body[body.index("") + 1 :]
    data_lines = [l for l in body if l and not l.startswith("=")]
    return base64.b64decode("".join(data_lines))


def iter_packets(data: bytes):
    """Yield (tag, body) for both old- and new-format packet headers."""
    pos = 0
    while pos < len(data):
        first = data[pos]
        if not first & 0x80:
            raise ValueError(f"invalid packet header byte {first:#x} at {pos}")
        if first & 0x40:  # new format
            tag = first & 0x3F
            l0 = data[pos + 1]
            if l0 < 192:
                n, hdr = l0, 2
            elif l0 < 224:
                n = ((l0 - 192) << 8) + data[pos + 2] + 192
                hdr = 3
            elif l0 == 255:
                n = struct.unpack(">I", data[pos + 2 : pos + 6])[0]
                hdr = 6
            else:
                raise ValueError("partial packet lengths unsupported")
        else:  # old format
            tag = (first >> 2) & 0x0F
            ltype = first & 0x03
            if ltype == 0:
                n, hdr = data[pos + 1], 2
            elif ltype == 1:
                n = struct.unpack(">H", data[pos + 1 : pos + 3])[0]
                hdr = 3
            elif ltype == 2:
                n = struct.unpack(">I", data[pos + 1 : pos + 5])[0]
                hdr = 5
            else:
                n, hdr = len(data) - pos - 1, 1
        yield tag, data[pos + hdr : pos + hdr + n]
        pos += hdr + n


# ---------------------------------------------------------------------------
# Public-key parsing (tags 6 = primary, 14 = subkey; RSA only)
# ---------------------------------------------------------------------------


def _parse_key_body(body: bytes) -> dict | None:
    if body[0] != 4:  # only v4 keys
        return None
    algo = body[5]
    if algo not in (1, 2, 3):  # RSA encrypt-or-sign / encrypt / sign
        return None
    n, pos = _read_mpi(body, 6)
    e, _ = _read_mpi(body, pos)
    fpr = hashlib.sha1(b"\x99" + struct.pack(">H", len(body)) + body).digest()
    return {"n": n, "e": e, "key_id": fpr[-8:].hex().upper(), "algo": algo}


def parse_public_key(armored: str) -> dict:
    """Extract RSA material from an armored public key block.

    Prefers the last encryption-capable subkey — algorithm 1
    (RSA encrypt-or-sign) or 2 (RSA encrypt-only); algorithm 3 subkeys
    (RSA sign-only, RFC 4880 §9.1) are never encryption targets, so a
    keyring whose latest subkey is a signing subkey still selects the
    encryption subkey (ADVICE r2). Falls back to an encryption-capable
    primary. Returns {"n", "e", "key_id", "algo"}.
    """
    primary, enc_subkey = None, None
    for tag, body in iter_packets(unarmor(armored)):
        if tag == 6 and primary is None:
            primary = _parse_key_body(body)
        elif tag == 14:
            parsed = _parse_key_body(body)
            if parsed and parsed["algo"] in (1, 2):
                enc_subkey = parsed
    key = enc_subkey
    if key is None and primary and primary["algo"] in (1, 2):
        key = primary
    if not key:
        raise ValueError("no encryption-capable RSA key packet found")
    return key


# ---------------------------------------------------------------------------
# Encryption
# ---------------------------------------------------------------------------


def _literal_packet(data: bytes, filename: bytes = b"data.csv") -> bytes:
    # 'b' binary format; zero timestamp keeps output free of wall-clock
    # reads (only the session key / prefix are intentionally random).
    body = b"b" + bytes([len(filename)]) + filename + b"\x00\x00\x00\x00" + data
    return _new_packet(11, body)


def encrypt_message(
    n: int, e: int, key_id: str, plaintext: bytes, filename: bytes = b"data.csv"
) -> str:
    """Armored PGP message: PKESK(RSA) + SEIPD(AES-256, MDC)."""
    from cryptography.hazmat.primitives.asymmetric import padding, rsa
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    try:  # CFB moved to the decrepit namespace in newer cryptography
        from cryptography.hazmat.decrepit.ciphers.modes import CFB
    except ImportError:
        from cryptography.hazmat.primitives.ciphers.modes import CFB

    session_key = os.urandom(32)

    # PKESK: m = algo(AES-256) || key || 16-bit checksum, PKCS#1 v1.5.
    checksum = sum(session_key) % 65536
    m = b"\x09" + session_key + struct.pack(">H", checksum)
    pub = rsa.RSAPublicNumbers(e, n).public_key()
    ct = pub.encrypt(m, padding.PKCS1v15())
    pkesk = _new_packet(
        1, b"\x03" + bytes.fromhex(key_id) + b"\x01" + _mpi(int.from_bytes(ct, "big"))
    )

    # SEIPD v1: CFB(zero IV) over prefix || literal || MDC (RFC 4880 §5.13).
    prefix = os.urandom(16)
    prefix += prefix[-2:]
    literal = _literal_packet(plaintext, filename)
    mdc_hash = hashlib.sha1(prefix + literal + b"\xd3\x14").digest()
    payload = prefix + literal + b"\xd3\x14" + mdc_hash
    enc = Cipher(algorithms.AES(session_key), CFB(b"\x00" * 16)).encryptor()
    seipd = _new_packet(18, b"\x01" + enc.update(payload) + enc.finalize())

    return armor(pkesk + seipd)

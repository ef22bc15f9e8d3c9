"""AES-GCM message crypto (driver-side scalars).

Parameter-compatible with the reference (cited for parity, not copied):
- PBKDF2-HMAC-SHA256 key derivation, 100 000 iterations, fixed salt
  ``DbWM_Salt_2024`` (reference: database/pgvector/pg_func.py:466-476,
  configs/aes_config.py PBKDF2_ITERATIONS/SALT).
- AES-256-GCM, 12-byte nonce, 8-byte (truncated) auth tag; 16-byte plaintext
  -> 24-byte ciphertext||tag -> exactly 32 base64 chars
  (reference: pg_func.py:479-567).

These run on the driver: the message is a single value, not a column
(SURVEY.md §2.4 P11/P12). The auth tag is the end-to-end arbiter of a
correct extraction (SURVEY.md §3.2).

Uses the ``cryptography`` package (PyCryptodome is not available here); the
low-level Cipher API is required because AESGCM's one-shot API hardcodes
16-byte tags while the reference uses ``mac_len=8``.
"""

from __future__ import annotations

import base64
import hashlib
import os

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

PLAINTEXT_LENGTH = 16
NONCE_LENGTH = 12
TAG_LENGTH = 8
PBKDF2_ITERATIONS = 100_000
SALT = b"DbWM_Salt_2024"


def derive_key_from_password(password: str, salt: bytes = SALT) -> bytes:
    """PBKDF2-HMAC-SHA256 -> 32-byte AES key (same password => same key)."""
    return hashlib.pbkdf2_hmac("sha256", password.encode("utf-8"), salt, PBKDF2_ITERATIONS)


def aes_gcm_encrypt(plaintext: str, password: str, nonce: bytes | None = None) -> tuple[bytes, bytes]:
    """Encrypt a 16-char message. Returns (ciphertext||tag8 = 24 bytes, nonce).

    ``nonce`` is generated randomly when not supplied (normal operation);
    passing it explicitly exists for known-answer tests.
    """
    pt = plaintext.encode("utf-8")
    if len(pt) != PLAINTEXT_LENGTH:
        raise ValueError(f"plaintext must be {PLAINTEXT_LENGTH} bytes, got {len(pt)}")
    key = derive_key_from_password(password)
    if nonce is None:
        nonce = os.urandom(NONCE_LENGTH)
    enc = Cipher(algorithms.AES(key), modes.GCM(nonce)).encryptor()
    ct = enc.update(pt) + enc.finalize()
    return ct + enc.tag[:TAG_LENGTH], nonce


def aes_gcm_decrypt(encrypted: bytes, password: str, nonce: bytes) -> str:
    """Decrypt + authenticate 24-byte ciphertext||tag. Raises ValueError on
    key mismatch or corruption (tag failure)."""
    if len(encrypted) != PLAINTEXT_LENGTH + TAG_LENGTH:
        raise ValueError(f"encrypted data must be {PLAINTEXT_LENGTH + TAG_LENGTH} bytes")
    if len(nonce) != NONCE_LENGTH:
        raise ValueError(f"nonce must be {NONCE_LENGTH} bytes")
    ct, tag = encrypted[:PLAINTEXT_LENGTH], encrypted[PLAINTEXT_LENGTH:]
    key = derive_key_from_password(password)
    dec = Cipher(
        algorithms.AES(key), modes.GCM(nonce, tag=tag, min_tag_length=TAG_LENGTH)
    ).decryptor()
    try:
        pt = dec.update(ct) + dec.finalize()
    except Exception as exc:  # InvalidTag and friends
        raise ValueError(f"decryption failed: wrong key or corrupted data ({exc})") from exc
    return pt.decode("utf-8")


def encrypt_message_to_32chars(plaintext: str, password: str, nonce: bytes | None = None) -> tuple[str, str]:
    """16-char plaintext -> (32-char base64 ciphertext string, nonce hex)."""
    encrypted, nonce = aes_gcm_encrypt(plaintext, password, nonce=nonce)
    cipher32 = base64.b64encode(encrypted).decode("ascii")
    assert len(cipher32) == 32, f"unexpected base64 length {len(cipher32)}"
    return cipher32, nonce.hex()


def decrypt_32chars_to_message(cipher32: str, password: str, nonce_hex: str) -> str:
    """Inverse of :func:`encrypt_message_to_32chars`; authenticates the tag."""
    if len(cipher32) != 32:
        raise ValueError("encrypted string must be 32 chars")
    encrypted = base64.b64decode(cipher32)
    return aes_gcm_decrypt(encrypted, password, bytes.fromhex(nonce_hex.strip()))

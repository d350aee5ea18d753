"""Key derivation for CLK hashing.

HKDF (RFC 5869) implemented over the stdlib ``hmac``/``hashlib`` so the
package has no crypto dependency on executors. Semantics match
data61/clkhash (reference: clkhash/key_derivation.py:20-136): derive
``num_hashing_methods`` (default 2) keys of ``key_size`` bytes (default 64)
per field, in field order *including ignored fields*; the ``legacy`` kdf
simply reuses the secret.
"""

from __future__ import annotations

import hashlib
import hmac
from typing import Optional, Tuple, Union

DEFAULT_KEY_SIZE = 64
DEFAULT_NUM_HASHING_METHODS = 2

_HASHES = {
    "SHA256": hashlib.sha256,
    "SHA512": hashlib.sha512,
}


def hkdf_extract_and_expand(
    secret: bytes,
    length: int,
    hash_algo: str = "SHA256",
    salt: Optional[bytes] = None,
    info: Optional[bytes] = None,
) -> bytes:
    """RFC 5869 HKDF: extract then expand to ``length`` bytes."""
    try:
        hash_fn = _HASHES[hash_algo]
    except KeyError as e:
        raise ValueError(f"unsupported hash function {hash_algo!r}") from e
    digest_size = hash_fn().digest_size
    if length > 255 * digest_size:
        raise ValueError("requested key material too long for HKDF expand")
    if salt is None:
        salt = b"\x00" * digest_size
    if info is None:
        info = b""
    prk = hmac.new(salt, secret, hash_fn).digest()
    okm = b""
    block = b""
    counter = 1
    while len(okm) < length:
        block = hmac.new(prk, block + info + bytes([counter]), hash_fn).digest()
        okm += block
        counter += 1
    return okm[:length]


def hkdf(
    secret: bytes,
    num_keys: int,
    hash_algo: str = "SHA256",
    salt: Optional[bytes] = None,
    info: Optional[bytes] = None,
    key_size: int = DEFAULT_KEY_SIZE,
) -> Tuple[bytes, ...]:
    """Derive ``num_keys`` keys of ``key_size`` bytes from ``secret``."""
    material = hkdf_extract_and_expand(
        secret, num_keys * key_size, hash_algo=hash_algo, salt=salt, info=info
    )
    return tuple(
        material[i * key_size:(i + 1) * key_size] for i in range(num_keys)
    )


def generate_key_lists(
    secret: Union[bytes, str],
    num_identifier: int,
    num_hashing_methods: int = DEFAULT_NUM_HASHING_METHODS,
    key_size: int = DEFAULT_KEY_SIZE,
    salt: Optional[bytes] = None,
    info: Optional[bytes] = None,
    kdf: str = "HKDF",
    hash_algo: str = "SHA256",
) -> Tuple[Tuple[bytes, ...], ...]:
    """Per-field key tuples: ``num_identifier`` x ``num_hashing_methods``.

    Keys are carved sequentially out of one HKDF expansion, grouped per
    identifier — i.e. field ``i`` gets keys
    ``[i*m, i*m + 1, ..., i*m + m - 1]``.
    """
    if num_hashing_methods < 1:
        raise ValueError(
            f"num_hashing_methods must be >= 1, got {num_hashing_methods}"
        )
    secret_bytes = secret if isinstance(secret, bytes) else secret.encode("utf-8")
    if kdf == "HKDF":
        flat = hkdf(
            secret_bytes,
            num_hashing_methods * num_identifier,
            hash_algo=hash_algo,
            salt=salt,
            info=info,
            key_size=key_size,
        )
        m = num_hashing_methods
        return tuple(flat[i * m:(i + 1) * m] for i in range(num_identifier))
    if kdf == "legacy":
        return tuple(
            (secret_bytes,) * num_hashing_methods for _ in range(num_identifier)
        )
    raise ValueError(f"kdf {kdf!r} is not supported")

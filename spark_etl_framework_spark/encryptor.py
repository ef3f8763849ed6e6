"""Password/variable encryption CLI — parity with the reference's standalone
``com.qwshen.Encryptor`` tool (reference: src/main/scala/com/qwshen/
Encryptor.scala:14-53: ``--key-string | --key-file`` exactly-one + required
``--data``, prints the ciphertext to stdout).

The produced value is what the pipeline builder's encrypted-variable hook
accepts: declare the variable with ``decrypt: true`` and supply the same key
as the ``decrypt.key`` variable (plans/builder.py ``_decrypt``). Cipher is
Fernet (AES-128-CBC + HMAC) keyed by sha256(key) — the stand-in for the
reference's jasypt AES-256; both sides of the round trip live in this repo
so the exact cipher is an implementation detail.

Usage::

    python -m spark_etl_framework_spark.encryptor --key-string s3cret --data pwd
    python -m spark_etl_framework_spark.encryptor --key-file /path/key --data pwd
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def encrypt(key: str, data: str) -> str:
    """Encrypt ``data`` so that plans/builder._decrypt(key) recovers it."""
    import base64
    import hashlib

    try:
        from cryptography.fernet import Fernet
    except ImportError as e:  # pragma: no cover - cryptography ships here
        raise RuntimeError(
            "the encryptor requires the 'cryptography' package"
        ) from e

    fkey = base64.urlsafe_b64encode(hashlib.sha256(key.encode()).digest())
    return Fernet(fkey).encrypt(data.encode()).decode()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="spark_etl_framework_spark.encryptor",
        description="Encrypt a value for use as a decrypt:true pipeline variable.",
    )
    ap.add_argument("--key-string", help="the key string")
    ap.add_argument("--key-file", help="file containing the key")
    ap.add_argument("--data", required=True, help="the text to be encrypted")
    args = ap.parse_args(argv)

    # exactly one key source (reference: Encryptor.scala:34-41)
    if (args.key_string is None) == (args.key_file is None):
        print(
            "Either the key-string or key-file must be provided, but not both.",
            file=sys.stderr,
        )
        return 2
    key = (
        args.key_string
        if args.key_string is not None
        else Path(args.key_file).read_text().strip()
    )
    print(encrypt(key, args.data))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

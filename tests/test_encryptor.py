"""Encryptor CLI round trip: the value printed by the CLI is accepted by the
pipeline builder's decrypt:true variable hook (reference parity:
com/qwshen/Encryptor.scala:44-53 + JsonPipelineBuilder's decrypt handling)."""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.encryptor import encrypt, main
from spark_etl_framework_spark.plans.builder import build_pipeline_from_file


def test_encrypt_decrypt_roundtrip_via_builder(tmp_path):
    token = encrypt("master-key", "s3cret-password")
    assert token != "s3cret-password"
    ypath = tmp_path / "p.yaml"
    ypath.write_text(
        f"""
name: enc-test
variables:
  - name: db_password
    value: "{token}"
    decrypt: true
jobs: []
"""
    )
    p = build_pipeline_from_file(
        str(ypath), cli_vars={"decrypt.key": "master-key"}
    )
    assert p.variables["db_password"] == "s3cret-password"


def test_cli_key_string_and_key_file(tmp_path, capsys):
    assert main(["--key-string", "k1", "--data", "hello"]) == 0
    tok1 = capsys.readouterr().out.strip()

    kf = tmp_path / "key.txt"
    kf.write_text("k1\n")
    assert main(["--key-file", str(kf), "--data", "hello"]) == 0
    tok2 = capsys.readouterr().out.strip()

    from spark_etl_framework_spark.plans.builder import _decrypt

    for tok in (tok1, tok2):
        assert _decrypt(tok, {"decrypt.key": "k1"}) == "hello"


def test_cli_requires_exactly_one_key_source(tmp_path):
    # neither
    assert main(["--data", "x"]) == 2
    # both
    kf = tmp_path / "key.txt"
    kf.write_text("k")
    assert main(["--key-string", "k", "--key-file", str(kf), "--data", "x"]) == 2


def test_cli_data_required():
    with pytest.raises(SystemExit):
        main(["--key-string", "k"])

"""Multimodal plumbing tests: binary column shape, Arrow batch path, and the
clearly-marked decode stub."""

from __future__ import annotations

import pytest

from database_toolbox_spark.operators.multimodal import (
    decode_image,
    multimodal_decode_features,
    with_binary_payload,
)
from tests.conftest import SF_DIR


def test_decode_stub_is_marked(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_binary_payload_schema(spark):
    df = with_binary_payload(spark, SF_DIR)
    kinds = dict(df.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<n_bytes:int")
    row = df.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)


def test_decode_features_roundtrip(spark):
    feats = {r.doc_id: r for r in multimodal_decode_features(spark, SF_DIR).collect()}
    src = {r.doc_id: r.payload for r in with_binary_payload(spark, SF_DIR).collect()}
    assert feats.keys() == src.keys()
    some = list(src)[:20]
    for d in some:
        assert feats[d].n_bytes == len(src[d])
        assert feats[d].first_byte == src[d][0]
        assert feats[d].checksum == sum(src[d]) % 65536

"""Multimodal plumbing tests: binary columns + typed metadata +
mapInPandas decode stages. The codec kernel is a deterministic fake
(container has no image/audio libs); the Spark-side plumbing — schema,
batch shape, partition parallelism, null handling, early pruning — is
real and is what's under test."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, b"\x89PNG\r\n" + b"A" * 2048),
        (2, b"\xff\xd8\xff\xe0" + b"B" * 4096),
        (3, b"RIFF1234WAVE" + b"C" * 1024),
        (4, b"\x00\x00\x00 ftypisom" + b"D" * 8192),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, media binary").repartition(3)


def test_attach_media_metadata_is_catalyst_only(media_df):
    from polars_readstat_spark.functions.multimodal import (
        attach_media_metadata,
    )

    out = attach_media_metadata(media_df)
    got = {r.doc_id: r.media_meta for r in out.collect()}
    assert got[1]["media_type"] == "image/png"
    assert got[2]["media_type"] == "image/jpeg"
    assert got[3]["media_type"] == "audio/wav"
    assert got[4]["media_type"] == "video/mp4"
    assert got[1]["size_bytes"] == 2054
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "mapInPandas" not in plan.lower()


def test_decode_images_schema_and_determinism(media_df):
    from polars_readstat_spark.functions.multimodal import decode_images

    out = decode_images(media_df, out_w=32, out_h=32)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,mean_luma:double,"
        "embedding:array<double>>"
    )
    a = {r.doc_id: (r.mean_luma, tuple(r.embedding or ())) for r in out.collect()}
    b = {r.doc_id: (r.mean_luma, tuple(r.embedding or ())) for r in out.collect()}
    assert a == b  # deterministic across runs
    assert a[5] == (None, ())  # null media → null features
    assert len(a) == 5
    assert all(len(v[1]) == 8 for k, v in a.items() if k != 5)


def test_decode_prunes_input_columns(spark):
    """The mapInPandas stage must select only key+media so extra wide
    columns never enter the Python worker."""
    from polars_readstat_spark.functions.multimodal import decode_images

    df = spark.createDataFrame(
        [(1, b"x" * 100, "wide" * 1000)],
        "doc_id long, media binary, huge string",
    )
    out = decode_images(df)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "huge" not in plan.split("MapInPandas")[0]


def test_frame_sample_explodes(media_df):
    from polars_readstat_spark.functions.multimodal import frame_sample

    out = frame_sample(media_df, every_n=2)
    rows = out.collect()
    # doc 4: 8 KiB+16B → 8 fake frames → sampled 0,2,4,6
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert sorted(per_doc[4]) == [0, 2, 4, 6]
    assert 5 not in per_doc  # null media contributes nothing


def test_audio_features_stub(media_df):
    from polars_readstat_spark.functions.multimodal import audio_features

    out = audio_features(media_df)
    got = {r.doc_id: r for r in out.collect()}
    assert got[3].n_samples == (1024 + 12) // 2
    assert 0.0 <= got[3].rms <= 1.0
    with pytest.raises(NotImplementedError):
        audio_features(media_df, decoder="real")


def test_decode_embed_query_self_differential(spark):
    """The registry query re-decodes a fixed 10-doc sample driver-side
    with the same kernel and raises on any divergence — the green path
    must pass, and the comparison must be bitwise (same floats)."""
    from polars_readstat_spark.queries.registry import all_queries

    df = all_queries()["multimodal_decode_embed"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() > 0


def test_decode_embed_self_check_catches_divergence(spark, monkeypatch):
    """Poison the distributed kernel only (decode_images captures its
    decoder at call time, the driver-side recompute calls
    deterministic_fake_decoder by name afterwards): the self-check
    must raise."""
    import pytest

    from polars_readstat_spark.functions import multimodal as M
    from polars_readstat_spark.queries.registry import all_queries

    real = M.decode_images

    def poisoned(df, media_col="media", key_cols=("doc_id",), **kw):
        kw["decoder"] = lambda data, w, h: (0.5, [0.25] * 8)
        return real(df, media_col, key_cols, **kw)

    monkeypatch.setattr(M, "decode_images", poisoned)
    with pytest.raises(AssertionError, match="self-check mismatch"):
        all_queries()["multimodal_decode_embed"](
            spark, "/root/testdata/sf0.001"
        )


def test_replayable_decoder_matches_manual_checksums():
    from polars_readstat_spark.functions.multimodal import (
        replayable_fake_decoder,
    )

    data = bytes(range(256)) * 3 + b"\x89PNG tail"
    luma, emb = replayable_fake_decoder(data, 32, 32)
    ck = sum(b * (i + 1) for i, b in enumerate(data))
    assert luma == (ck % 256_000) / 1000.0
    assert len(emb) == 8
    for k in range(8):
        assert emb[k] == (sum(data[k::8]) % 256) / 255.0
    # empty payload: defined, zero checksums
    luma0, emb0 = replayable_fake_decoder(b"", 32, 32)
    assert luma0 == 0.0 and emb0 == [0.0] * 8

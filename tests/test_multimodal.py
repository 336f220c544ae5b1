"""Multimodal plumbing: binary columns through Arrow-batched mapInPandas."""

from ingestion_scripts_spark.operators import multimodal as M


def test_extract_features_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id long, text string"
    )
    media = M.text_to_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = M.extract_features(media).collect()
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].n_bytes == len(b"hello world")
    assert len(by_id[1].feature) == 8
    # deterministic fake decode
    import hashlib
    assert by_id[2].digest == hashlib.md5(b"spark engine").hexdigest()


def test_decode_failure_dead_letters(spark):
    media = spark.createDataFrame(
        [(1, b"ok"), (2, b"fail")], "media_id long, payload binary"
    )

    def decoder(b):
        if b == b"fail":
            raise ValueError("boom")
        return M.fake_decode(b)

    rows = {r.media_id: r for r in M.extract_features(media, decode_fn=decoder).collect()}
    assert rows[1].digest is not None
    assert rows[2].digest is None  # null features, row preserved (K4)


def test_resize_and_frame_sample_plumbing(spark):
    from ingestion_scripts_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        text_to_media,
    )

    docs = spark.createDataFrame(
        [(1, "hello world " * 40), (2, "tiny")], "doc_id long, text string"
    )
    media = text_to_media(docs)

    resized = resize_images(media, width=8, height=4).collect()
    by_id = {r.media_id: r for r in resized}
    assert len(by_id[1].payload) == 32 and len(by_id[2].payload) == 32
    assert by_id[1].meta.width == 8 and by_id[1].meta.media_type == "image/fake"
    # deterministic: same content → same bytes
    again = {r.media_id: r for r in resize_images(media, 8, 4).collect()}
    assert bytes(again[1].payload) == bytes(by_id[1].payload)

    frames = sample_frames(media).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.media_id, []).append(r.frame_no)
    assert per_doc[1] == sorted(per_doc[1])  # ordered frame index
    assert len(per_doc[1]) > len(per_doc.get(2, []))  # longer payload → more frames


def test_audio_energy_windows_exact(spark):
    """Per-window energy matches a pure-Python recompute byte for byte,
    and window lineage covers the whole payload with no gaps."""
    import base64

    from ingestion_scripts_spark.operators.multimodal import (
        audio_energy_windows,
        text_to_media,
    )

    docs = spark.createDataFrame(
        [(1, "hello world " * 20), (2, "x"), (3, "abc" * 64)],
        ["doc_id", "text"],
    )
    out = audio_energy_windows(text_to_media(docs)).collect()
    got = {(r.media_id, r.win_no): (r.n_samples, r.energy) for r in out}
    for doc_id, text in [(1, "hello world " * 20), (2, "x"), (3, "abc" * 64)]:
        s = base64.b64encode(text.encode()).decode()
        chunks = [s[i : i + 64] for i in range(0, len(s), 64)]
        for w, c in enumerate(chunks):
            assert got[(doc_id, w)] == (len(c), sum(ord(ch) ** 2 for ch in c))
        # no extra windows
        assert not any(k[0] == doc_id and k[1] >= len(chunks) for k in got)

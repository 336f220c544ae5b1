"""Multimodal columns — binary payloads with typed metadata (extension op).

Design (SURVEY.md §2.9): image/audio/video are opaque ``binary`` columns plus
a metadata struct; decode/feature-extract run as Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches. The actual
media decoding libraries are NOT in this container, so the decode kernel is
pluggable: callers pass ``decode_fn(bytes) -> features`` and the default is a
deterministic fake (length + md5-prefix) marked as such. The Spark-side
plumbing — schema, batching, partition sizing — is real and tested.

Scale: binary payloads dominate row size; ``repartition`` by byte budget
before the UDF so one Arrow batch fits executor memory (the helper computes
target partitions from an explicit bytes-per-partition budget instead of row
counts — rows are wildly non-uniform in media tables).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(payload: bytes) -> tuple[int, str, list[float]]:
    """Deterministic stand-in for a real media decoder (image/audio libs are
    not installed here). Real deployments inject e.g. PIL/librosa kernels."""
    if payload is None:
        raise NotImplementedError("media decode of null payload")
    digest = hashlib.md5(payload).hexdigest()
    # 8 pseudo-features from the digest — stable, content-derived
    feats = [int(digest[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(8)]
    return len(payload), digest, feats


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_fn: Callable[[bytes], tuple[int, str, list[float]]] = fake_decode,
    bytes_per_partition: int = 128 << 20,
    approx_total_bytes: int | None = None,
) -> DataFrame:
    """payload binary → (id, n_bytes, digest, feature[8]) via mapInPandas.

    Arrow moves the binary column to Python in batches; failures yield null
    features (dead-letter convention K4) instead of failing the stage.
    """
    if approx_total_bytes:
        parts = max(1, approx_total_bytes // bytes_per_partition)
        df = df.repartition(int(parts))

    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType())] + list(FEATURE_SCHEMA.fields)
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    n, digest, feats = decode_fn(bytes(payload))
                    rows.append((mid, n, digest, feats))
                except Exception:
                    rows.append((mid, None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "digest", "feature"]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, out_schema)


def text_to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture builder: fabricate a binary media table from a text
    table (utf-8 payload + metadata struct)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/fake").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize kernel (no image libs in
    this container — real deployments inject a PIL kernel). Marked fake:
    emits a content-derived byte string of length width*height."""
    if payload is None:
        raise NotImplementedError("media resize of null payload")
    digest = hashlib.md5(payload).digest()
    need = max(0, width * height)
    return (digest * (need // len(digest) + 1))[:need]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    resize_fn: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """payload → resized payload + updated meta, via mapInPandas (Arrow
    moves binary batches; kernel pluggable, default deterministic fake)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    out = resize_fn(bytes(payload), width, height)
                    rows.append((mid, out, ("image/fake", width, height, None)))
                except Exception:
                    rows.append((mid, None, None))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_nth_byte: int = 64,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emits one row per
    sampled "frame" (posexplode shape). The frame extractor is a
    deterministic fake (every Nth byte slice) — real deployments plug a
    decoder; the exploded schema, ordering column and per-row lineage are
    the real contract."""
    # Spark's base64() MIME-chunks with \r\n every 76 chars (JDK
    # Base64.getMimeEncoder, legacy.chunkBase64String default) — strip the
    # breaks so the stride arithmetic addresses the raw encoding on every
    # engine/conf
    b64 = F.regexp_replace(F.base64(F.col(payload_col)), "[\\r\\n]", "")
    frames = F.slice(
        F.transform(
            F.sequence(F.lit(0), F.lit(max_frames - 1)),
            lambda i: F.substring(b64, i * every_nth_byte + 1, 16),
        ),
        1,
        max_frames,
    )
    ex = df.select(
        F.col(id_col), F.posexplode(frames).alias("frame_no", "frame_token")
    )
    return ex.filter(F.col("frame_token") != "")


def audio_energy_windows(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    window: int = 64,
) -> DataFrame:
    """Fixed-window energy profile over an audio-like binary payload —
    the framing leg audio pipelines need (VAD, silence trimming, loudness
    normalization all start from per-window energy). The payload is
    treated as a PCM-ish sample stream; as with the other kernels the
    sample DECODE is a documented deterministic stand-in (base64 bytes of
    the payload — ASCII, so the DuckDB oracle can recompute every sample
    with ascii()), while the Arrow plumbing — binary column through
    mapInPandas, per-window lineage (media_id, win_no), exact BIGINT
    energy sums — is the real contract.

    Returns (media_id, win_no, n_samples, energy) with
    energy = sum(sample_i^2) as exact int64 (no float anywhere).
    """
    import base64

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("win_no", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, wins, ns, es = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                s = base64.b64encode(bytes(payload)).decode("ascii")
                for w in range(0, (len(s) + window - 1) // window):
                    chunk = s[w * window : (w + 1) * window]
                    if not chunk:
                        continue
                    ids.append(int(mid))
                    wins.append(w)
                    ns.append(len(chunk))
                    es.append(sum(ord(c) * ord(c) for c in chunk))
            yield pd.DataFrame(
                {"media_id": ids, "win_no": wins, "n_samples": ns, "energy": es}
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def ahash_bands(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    bytes_per_partition: int = 128 << 20,
) -> DataFrame:
    """64-pixel average-hash (aHash) of a binary payload, returned as four
    16-bit band integers — the perceptual-dedup leg of the multimodal
    surface: identical plumbing to production image near-dup (decode →
    8x8 grayscale → threshold at the mean → 64-bit hash → banded hamming
    join), with the DECODE stand-in being the documented deterministic
    fake (the base64 byte stream of the payload, cycled to 64 samples) so
    the DuckDB oracle can recompute every pixel with ``ascii()`` and the
    whole Arrow round-trip is value-checked. Real deployments swap the
    pixel source for a PIL/libvips 8x8 resize; everything downstream —
    bit packing, banding, hamming verify — is unchanged.

    Bit law: pixel j (1-based) sets bit (15 - (j-1) % 16) of band
    (j-1) div 16 iff 64 * p_j > sum(p) — strict, integer-exact, no
    division. Four 16-bit bands instead of one 64-bit word so a hamming
    radius <= 3 candidate MUST share one exact band (pigeonhole over 4
    bands), making candidate generation an equi-join, never all-pairs.

    Empty payloads yield NULL bands (no pixels to threshold).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("b0", T.LongType()),
            T.StructField("b1", T.LongType()),
            T.StructField("b2", T.LongType()),
            T.StructField("b3", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import base64

        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                s = base64.b64encode(bytes(payload)).decode("ascii")
                if not s:
                    rows.append((mid, None, None, None, None))
                    continue
                s64 = (s * (64 // len(s) + 1))[:64]
                px = [ord(c) for c in s64]
                tot = sum(px)
                bits = [1 if 64 * p > tot else 0 for p in px]
                bands = [
                    sum(
                        bit << (15 - j)
                        for j, bit in enumerate(bits[i * 16 : (i + 1) * 16])
                    )
                    for i in range(4)
                ]
                rows.append((mid, *bands))
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, out_schema
    )


def ahash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs from ``ahash_bands`` output: candidates share at
    least one exact 16-bit band (guaranteed complete for hamming <=
    3 by pigeonhole over 4 bands), verified with exact bit_count(xor)
    hamming. Returns (id_a, id_b, hamming), id_a < id_b."""
    bands = hashes.select(
        "media_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band_no", "bv"),
    ).filter(F.col("bv").isNotNull())
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_no") == F.col("r.band_no"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("id_a"),
            F.col("r.media_id").alias("id_b"),
            (
                F.bit_count(F.expr("l.b0").bitwiseXOR(F.expr("r.b0")))
                + F.bit_count(F.expr("l.b1").bitwiseXOR(F.expr("r.b1")))
                + F.bit_count(F.expr("l.b2").bitwiseXOR(F.expr("r.b2")))
                + F.bit_count(F.expr("l.b3").bitwiseXOR(F.expr("r.b3")))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand

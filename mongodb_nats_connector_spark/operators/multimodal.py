"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with metadata
columns alongside (the same pattern the reference uses for its schemaless
`fullDocument` BSON blob — extract the envelope, pass the payload through
opaque, SURVEY.md §1.2). Decode / feature-extraction runs as Arrow-batched
pandas over `mapInPandas`; the actual image/audio codecs are STUBBED (libs
not in this container) behind `decode_stub`, but the Spark-side plumbing —
schema, batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("fake_width", LongType(), True),
        StructField("fake_height", LongType(), True),
        StructField("codec", StringType(), True),
    ]
)


def sniff_image_dims(payload: bytes) -> tuple[int, int, str] | None:
    """Real image-dimension extraction by HEADER parsing (pure stdlib — the
    way dimension metadata is actually computed over petabyte image corpora:
    peek the container header, never decode pixels). Supports PNG, GIF and
    JPEG; returns (width, height, codec) or None for non-image payloads."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h), "png"
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h), "gif"
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # walk JPEG markers to the first SOF segment
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h), "jpeg"
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def real_decode(payload: bytes) -> tuple[int, int]:
    """Full pixel decode via PIL when the library exists (feature-gated);
    raises NotImplementedError in codec-less environments. Header-only
    dimension extraction does NOT need this — see sniff_image_dims."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "media codecs are not available in this environment"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return img.size


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in: derive fake dimensions from the payload bytes
    so tests are reproducible without codec libraries."""
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: real header-sniffed dimensions for payloads
    that ARE images (PNG/GIF/JPEG), deterministic stub dims otherwise.
    The fixture corpus is ASCII text, so the oracle-checked output is all
    stub rows; golden-image unit tests pin the real path."""
    for pdf in batches:
        ids, nbytes, widths, heights, codecs = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            sniffed = sniff_image_dims(buf)
            if sniffed is None:
                w, h = fake_decode(buf)
                codec = "stub"
            else:
                w, h, codec = sniffed
            ids.append(doc_id)
            nbytes.append(len(buf))
            widths.append(w)
            heights.append(h)
            codecs.append(codec)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_bytes": pd.Series(nbytes, dtype="int64"),
                "fake_width": pd.Series(widths, dtype="int64"),
                "fake_height": pd.Series(heights, dtype="int64"),
                "codec": codecs,
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model the multimodal table: text encoded to an opaque binary column."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"), "source"
    )


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(substr(hex(encode(text)), 1, 16))    AS prefix_hex,
           source
    FROM documents
    """,
    doc="Typed metadata over an opaque binary column: byte length + hex "
    "prefix, computed without decoding (scan stays columnar; the payload is "
    "never deserialized driver-side).",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.upper(F.substring(F.hex("payload"), 1, 16)).alias("prefix_hex"),
        "source",
    )


@register(
    "multimodal_decode_features",
    # the stub 'decode' derives features from payload length alone — pure
    # arithmetic, so the driver hash-checks the full mapInPandas plumbing
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)               AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT)     AS fake_width,
           CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS fake_height,
           'stub' AS codec
    FROM documents
    """,
    doc="mapInPandas feature extraction over binary payloads: Arrow batches "
    "in, typed feature rows out. Image payloads (PNG/GIF/JPEG) get REAL "
    "header-parsed dimensions (stdlib, no pixel decode — the petabyte-scale "
    "metadata path); non-image payloads fall back to the deterministic "
    "stub, which is what the all-text fixture corpus exercises for the "
    "oracle. Full pixel decode (real_decode) stays PIL-gated.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return docs.mapInPandas(_decode_batches, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_bytes", LongType(), False),
        StructField("frame_checksum", LongType(), False),
    ]
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Treat the binary payload as a fake video: fixed-size 32-byte 'frames',
    sample every 4th (deterministic stride). A real implementation swaps the
    chunker for an av/ffmpeg decode — the batching/schema stays identical."""
    for pdf in batches:
        ids, idxs, sizes, sums = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = [payload[i : i + 32] for i in range(0, len(payload), 32)]
            for k in range(0, len(frames), 4):
                ids.append(doc_id)
                idxs.append(k)
                sizes.append(len(frames[k]))
                sums.append(int(sum(frames[k]) % 65536))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_bytes": pd.Series(sizes, dtype="int64"),
                "frame_checksum": pd.Series(sums, dtype="int64"),
            }
        )


@register(
    "multimodal_frame_sample",
    # The stub chunker is deterministic byte arithmetic over encode(text)
    # (documents.text is ASCII, so ascii(substr(text, i, 1)) IS byte i):
    # fully SQL-expressible, so the driver hash-checks it like any query.
    oracle="""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ), f AS (
      SELECT doc_id, text, n,
             unnest(range(0, CAST(ceil(n / 32.0) AS BIGINT), 4)) AS frame_idx
      FROM d
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(least(32, n - 32 * frame_idx) AS BIGINT) AS frame_bytes,
           CAST(list_sum(list_transform(
                  range(1, CAST(least(32, n - 32 * frame_idx) AS BIGINT) + 1),
                  j -> ascii(substr(text, CAST(32 * frame_idx + j AS BIGINT), 1))
                )) % 65536 AS BIGINT) AS frame_checksum
    FROM f
    """,
    doc="Frame sampling over opaque binary 'video' payloads via mapInPandas: "
    "fixed-stride frame selection with per-frame metadata. Decode is a "
    "deterministic byte-chunking stub (no codec libs in this env); the "
    "Spark-side plumbing — Arrow batches, typed schema, partition "
    "parallelism — is the real thing.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents", parallel=True))
    return docs.mapInPandas(_frame_sample_batches, FRAME_SCHEMA)


@register(
    "multimodal_resize_stub",
    # fake_decode is (n%640)+1 x ((n*7)%480)+1 over n = payload bytes; the
    # resize box is floor(x*256/max + 0.5) — explicitly floor-based (NOT
    # Python round(): banker's rounding has no SQL equivalent) so the same
    # IEEE-double expression evaluates identically in DuckDB.
    oracle="""
    WITH d AS (
      SELECT doc_id,
             octet_length(encode(text)) % 640 + 1       AS width,
             (octet_length(encode(text)) * 7) % 480 + 1 AS height
      FROM documents
    )
    SELECT doc_id,
           CAST(width  AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(greatest(1, floor((width  * 256.0) / greatest(width, height) + 0.5))
                AS BIGINT) AS out_width,
           CAST(greatest(1, floor((height * 256.0) / greatest(width, height) + 0.5))
                AS BIGINT) AS out_height
    FROM d
    """,
    doc="Image-resize stub via mapInPandas: fake decode derives (w, h) from "
    "payload bytes, 'resize' computes the target box preserving aspect "
    "ratio (pure arithmetic, deterministic). Swap fake_decode for PIL at "
    "deploy time; raise real_decode's NotImplementedError path otherwise.",
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    target = 256

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h = fake_decode(bytes(payload))
                m = max(w, h)
                # floor(x + 0.5), not round(): bit-identical to the DuckDB
                # oracle's floor expression (banker's rounding is not)
                out_w = max(1, math.floor((w * float(target)) / m + 0.5))
                out_h = max(1, math.floor((h * float(target)) / m + 0.5))
                rows.append((doc_id, w, h, out_w, out_h))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "out_width", "out_height"]
            ).astype("int64")

    docs = with_binary_payload(table(spark, sf_dir, "documents", parallel=True))
    return docs.mapInPandas(
        resize,
        "doc_id BIGINT, width BIGINT, height BIGINT, out_width BIGINT, out_height BIGINT",
    )


WAV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("bits", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def sniff_wav_meta(payload: bytes) -> tuple[int, int, int, int, int, int] | None:
    """Real WAV metadata by RIFF-header parsing (pure stdlib): sample rate,
    channels, bit depth, byte rate, block align, data size from the canonical
    44-byte header — no sample decode, the petabyte-scale audio-metadata
    path. Returns None for non-WAV payloads."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    if payload[12:16] != b"fmt " or payload[36:40] != b"data":
        return None
    _fmt_size, _audio_fmt, channels, rate = struct.unpack(
        "<IHHI", payload[16:28]
    )
    byte_rate, block_align, bits = struct.unpack("<IHH", payload[28:36])
    (data_size,) = struct.unpack("<I", payload[40:44])
    return rate, channels, bits, byte_rate, block_align, data_size


def _wav_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched WAV header extraction: real RIFF parse; non-WAV payloads
    yield NULL metadata (the typed-miss row, not a crash)."""
    for pdf in batches:
        ids, rates, chans, bits_l, samps, durs = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = sniff_wav_meta(bytes(payload))
            ids.append(doc_id)
            # degenerate-but-magic-valid headers (block_align or rate 0)
            # are typed misses too, never a ZeroDivisionError in the task
            if meta is not None and (meta[0] == 0 or meta[4] == 0):
                meta = None
            if meta is None:
                rates.append(None)
                chans.append(None)
                bits_l.append(None)
                samps.append(None)
                durs.append(None)
            else:
                rate, channels, bits, _br, block_align, data_size = meta
                n_samples = data_size // block_align
                rates.append(rate)
                chans.append(channels)
                bits_l.append(bits)
                samps.append(n_samples)
                durs.append(n_samples * 1000 // rate)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "sample_rate": pd.Series(rates, dtype="Int64"),
                "channels": pd.Series(chans, dtype="Int64"),
                "bits": pd.Series(bits_l, dtype="Int64"),
                "n_samples": pd.Series(samps, dtype="Int64"),
                "duration_ms": pd.Series(durs, dtype="Int64"),
            }
        )


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("window_idx", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("rms_energy", LongType(), False),
    ]
)


def _audio_energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Treat the binary payload as fake PCM: int16 little-endian samples,
    non-overlapping 64-sample windows, integer RMS energy per window. A real
    implementation swaps the frombuffer for an audio decode (soundfile/libav);
    the Arrow batching, window shape, and output schema are unchanged."""
    import numpy as np

    for pdf in batches:
        ids, idxs, counts, energies = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            samples = np.frombuffer(buf[: len(buf) - (len(buf) % 2)], dtype="<i2")
            for w in range(0, len(samples), 64):
                chunk = samples[w : w + 64].astype(np.int64)
                ids.append(doc_id)
                idxs.append(w // 64)
                counts.append(len(chunk))
                energies.append(int(np.sqrt(np.mean(chunk * chunk))))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(idxs, dtype="int64"),
                "n_samples": pd.Series(counts, dtype="int64"),
                "rms_energy": pd.Series(energies, dtype="int64"),
            }
        )


@register(
    "multimodal_audio_energy",
    # fake-PCM int16 little-endian over ASCII payload bytes: sample s is
    # byte(2s) + 256*byte(2s+1) sign-folded; 64-sample windows; integer RMS.
    # Sums of <=64 int squares are exact in double on both engines, so
    # trunc(sqrt(avg)) is deterministic.
    oracle="""
    WITH s AS (
      SELECT doc_id, text, octet_length(encode(text)) // 2 AS n_samp
      FROM documents
    ), samp AS (
      SELECT doc_id, text, unnest(range(n_samp)) AS i FROM s WHERE n_samp > 0
    ), raw AS (
      SELECT doc_id, i // 64 AS window_idx,
             ascii(substr(text, CAST(2 * i + 1 AS BIGINT), 1))
             + 256 * ascii(substr(text, CAST(2 * i + 2 AS BIGINT), 1)) AS u
      FROM samp
    ), v AS (
      SELECT doc_id, window_idx,
             u - 65536 * CAST(u >= 32768 AS INTEGER) AS val
      FROM raw
    )
    SELECT doc_id,
           CAST(window_idx AS BIGINT) AS window_idx,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(trunc(sqrt(avg(val * val))) AS BIGINT) AS rms_energy
    FROM v GROUP BY doc_id, window_idx
    """,
    doc="Windowed audio-energy extraction over opaque binary payloads via "
    "mapInPandas: fake-PCM int16 samples, 64-sample windows, integer RMS "
    "per window. Completes the image/video/audio stub triple — same "
    "partition-parallel Arrow plumbing a real decoder would use.",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents", parallel=True))
    return docs.mapInPandas(_audio_energy_batches, AUDIO_SCHEMA)


MP4_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("n_top_boxes", LongType(), True),
        StructField("major_brand", StringType(), True),
        StructField("timescale", LongType(), True),
        StructField("duration_ticks", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def sniff_mp4_meta(payload: bytes) -> tuple[int, str, int, int] | None:
    """Real ISO-BMFF (MP4/MOV) metadata by box walking (pure stdlib): count
    top-level boxes, read the ftyp major brand, and pull timescale/duration
    out of moov/mvhd (version 0 or 1) — no sample decode, the
    petabyte-scale video-metadata path. Returns None for non-BMFF payloads
    (missing ftyp, truncated or non-positive box sizes)."""
    import struct

    n = len(payload)
    if n < 16:
        return None
    off = 0
    n_top = 0
    brand = None
    timescale = duration = None
    while off + 8 <= n:
        (size,) = struct.unpack(">I", payload[off : off + 4])
        btype = payload[off + 4 : off + 8]
        if size < 8 or off + size > n:
            return None
        n_top += 1
        if btype == b"ftyp":
            brand = payload[off + 8 : off + 12].decode("ascii", "replace")
        elif btype == b"moov":
            coff = off + 8
            while coff + 8 <= off + size:
                (csize,) = struct.unpack(">I", payload[coff : coff + 4])
                ctype = payload[coff + 4 : coff + 8]
                if csize < 8 or coff + csize > off + size:
                    return None
                if ctype == b"mvhd" and csize >= 32:
                    version = payload[coff + 8]
                    if version == 1:
                        # v1 mvhd needs 44 bytes for its 64-bit fields; a
                        # shorter box is malformed — typed miss, never a
                        # v0-offset garbage parse
                        if csize < 44:
                            return None
                        timescale, = struct.unpack(
                            ">I", payload[coff + 28 : coff + 32]
                        )
                        duration, = struct.unpack(
                            ">Q", payload[coff + 32 : coff + 40]
                        )
                        # unsigned 64-bit duration can exceed int64 on
                        # adversarial payloads — bounds-check before it
                        # lands in an Int64 pandas column; the derived
                        # duration_ms (1000*duration//timescale) must pass
                        # the same bound or a small-timescale payload
                        # (e.g. timescale=1, duration=2^62) crashes the
                        # Int64 series construction downstream
                        if duration >= 2**63:
                            return None
                        if timescale and 1000 * duration // timescale >= 2**63:
                            return None
                    else:
                        timescale, duration = struct.unpack(
                            ">II", payload[coff + 20 : coff + 28]
                        )
                coff += csize
        off += size
    if brand is None or timescale is None or timescale == 0:
        return None
    return n_top, brand, timescale, duration


def _mp4_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched MP4 box walking: real ISO-BMFF parse; non-BMFF payloads
    yield NULL metadata (the typed-miss row, not a crash)."""
    for pdf in batches:
        ids, nb, ntop, brands, tss, durs, ms = [], [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            meta = sniff_mp4_meta(raw)
            ids.append(doc_id)
            nb.append(len(raw))
            if meta is None:
                ntop.append(None)
                brands.append(None)
                tss.append(None)
                durs.append(None)
                ms.append(None)
            else:
                n_top, brand, timescale, duration = meta
                ntop.append(n_top)
                brands.append(brand)
                tss.append(timescale)
                durs.append(duration)
                ms.append(1000 * duration // timescale)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_bytes": pd.Series(nb, dtype="Int64"),
                "n_top_boxes": pd.Series(ntop, dtype="Int64"),
                "major_brand": pd.Series(brands, dtype="object"),
                "timescale": pd.Series(tss, dtype="Int64"),
                "duration_ticks": pd.Series(durs, dtype="Int64"),
                "duration_ms": pd.Series(ms, dtype="Int64"),
            }
        )


PCM_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("sum_samples", LongType(), True),
        StructField("min_sample", LongType(), True),
        StructField("max_sample", LongType(), True),
        StructField("abs_sum", LongType(), True),
        StructField("weighted_checksum", LongType(), True),
    ]
)


def decode_wav_pcm16(payload: bytes) -> list[int] | None:
    """REAL PCM payload decode (pure stdlib) for CANONICAL 44-byte-header
    WAV only (fmt at offset 12, data at offset 36 — the layout
    sniff_wav_meta accepts): unpack the data chunk's 16-bit little-endian
    signed samples. WAVs with extra chunks (LIST/fact) or extended fmt are
    typed misses by design — parity-consistent here since the operator
    constructs canonical files; a real chunk walk is the documented upgrade
    path for non-canonical corpora. This is the first multimodal operator
    whose SAMPLE DATA (not just container metadata) sits on the
    oracle-verified hash surface. Returns None for non-WAV / non-16-bit /
    truncated payloads (typed miss, never a crash)."""
    import struct

    meta = sniff_wav_meta(payload)
    if meta is None:
        return None
    _rate, _channels, bits, _br, _ba, data_size = meta
    if bits != 16 or data_size % 2 != 0:
        return None
    data = payload[44 : 44 + data_size]
    if len(data) != data_size:
        return None
    return list(struct.unpack("<%dh" % (data_size // 2), data))


def _pcm_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched PCM sample statistics over decoded 16-bit samples:
    count / sum / min / max / sum|s| / order-weighted checksum
    sum((i+1)*s_i). The weighted checksum proves BYTE ORDER survived the
    construct->Arrow->decode pipeline, not just the sample multiset."""
    for pdf in batches:
        ids, ns, sums, mins, maxs, absol, wsum = [], [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = decode_wav_pcm16(bytes(payload))
            ids.append(doc_id)
            if samples is None or not samples:
                ns.append(None)
                sums.append(None)
                mins.append(None)
                maxs.append(None)
                absol.append(None)
                wsum.append(None)
            else:
                ns.append(len(samples))
                sums.append(sum(samples))
                mins.append(min(samples))
                maxs.append(max(samples))
                absol.append(sum(abs(s) for s in samples))
                wsum.append(sum((i + 1) * s for i, s in enumerate(samples)))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_samples": pd.Series(ns, dtype="Int64"),
                "sum_samples": pd.Series(sums, dtype="Int64"),
                "min_sample": pd.Series(mins, dtype="Int64"),
                "max_sample": pd.Series(maxs, dtype="Int64"),
                "abs_sum": pd.Series(absol, dtype="Int64"),
                "weighted_checksum": pd.Series(wsum, dtype="Int64"),
            }
        )


BMP_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
        StructField("raster_checksum", LongType(), True),
    ]
)


def decode_bmp24(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    """REAL uncompressed 24-bit BMP pixel decode (pure stdlib): parse the
    BITMAPFILEHEADER + BITMAPINFOHEADER, honor the 4-byte row stride and
    the BOTTOM-UP row order, and return pixels as (r, g, b) in logical
    raster order (top row first, left to right). This is the second
    multimodal operator whose PAYLOAD (pixel values, not container
    metadata) sits on the oracle-verified hash surface. Returns None for
    non-BMP / compressed / non-24bpp / truncated payloads."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (offset,) = struct.unpack("<I", payload[10:14])
    bisize, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bisize != 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    if w <= 0 or h <= 0:
        return None
    stride = (3 * w + 3) // 4 * 4
    if len(payload) < offset + stride * h:
        return None
    pixels: list[tuple[int, int, int]] = []
    for y in range(h):  # logical top row first
        row_off = offset + (h - 1 - y) * stride  # stored bottom-up
        for x in range(w):
            o = row_off + 3 * x
            b, g, r = payload[o], payload[o + 1], payload[o + 2]
            pixels.append((r, g, b))
    return w, h, pixels


def _bmp_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched BMP pixel statistics: channel sums plus the raster-
    order weighted checksum sum((i+1)*(r + 2g + 3b)), which only matches
    the oracle if the decoder honored BOTH the row stride padding and the
    bottom-up storage flip."""
    for pdf in batches:
        ids, ws, hs, np_, sr, sg, sb, ck = [], [], [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            decoded = decode_bmp24(bytes(payload))
            ids.append(doc_id)
            if decoded is None:
                ws.append(None)
                hs.append(None)
                np_.append(None)
                sr.append(None)
                sg.append(None)
                sb.append(None)
                ck.append(None)
            else:
                w, h, px = decoded
                ws.append(w)
                hs.append(h)
                np_.append(len(px))
                sr.append(sum(p[0] for p in px))
                sg.append(sum(p[1] for p in px))
                sb.append(sum(p[2] for p in px))
                ck.append(
                    sum(
                        (i + 1) * (p[0] + 2 * p[1] + 3 * p[2])
                        for i, p in enumerate(px)
                    )
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="Int64"),
                "height": pd.Series(hs, dtype="Int64"),
                "n_pixels": pd.Series(np_, dtype="Int64"),
                "sum_r": pd.Series(sr, dtype="Int64"),
                "sum_g": pd.Series(sg, dtype="Int64"),
                "sum_b": pd.Series(sb, dtype="Int64"),
                "raster_checksum": pd.Series(ck, dtype="Int64"),
            }
        )


GIF_ANIM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("total_delay_cs", LongType(), True),
    ]
)


def walk_gif_frames(payload: bytes) -> tuple[int, int, int, int] | None:
    """Real animated-GIF structure walking (pure stdlib): header + logical
    screen descriptor, then the block stream — graphic-control extensions
    (accumulating frame delays), image descriptors (counting frames,
    skipping local color tables and LZW sub-blocks BY LENGTH, no pixel
    decode), other extensions skipped, trailer terminates. Returns
    (width, height, n_frames, total_delay_centiseconds) or None for
    non-GIF / truncated / malformed payloads."""
    import struct

    n = len(payload)
    if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    off = 13
    if packed & 0x80:  # global color table present
        off += 3 * (2 << (packed & 0x07))
    frames = 0
    total_delay = 0

    def skip_subblocks(o: int) -> int | None:
        while True:
            if o >= n:
                return None
            size = payload[o]
            o += 1
            if size == 0:
                return o
            o += size

    while off < n:
        b = payload[off]
        if b == 0x3B:  # trailer
            return int(w), int(h), frames, total_delay
        if b == 0x21:  # extension
            if off + 2 > n:
                return None
            label = payload[off + 1]
            if label == 0xF9 and off + 8 <= n and payload[off + 2] == 4:
                (delay,) = struct.unpack("<H", payload[off + 4 : off + 6])
                total_delay += delay
            nxt = skip_subblocks(off + 2)
            if nxt is None:
                return None
            off = nxt
        elif b == 0x2C:  # image descriptor
            if off + 10 > n:
                return None
            ipacked = payload[off + 9]
            off += 10
            if ipacked & 0x80:  # local color table
                off += 3 * (2 << (ipacked & 0x07))
            if off >= n:
                return None
            off += 1  # LZW minimum code size
            nxt = skip_subblocks(off)
            if nxt is None:
                return None
            off = nxt
            frames += 1
        else:
            return None
    return None  # no trailer


def _gif_frames_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched GIF structure walking; non-GIF payloads yield the
    typed-miss row."""
    for pdf in batches:
        ids, ws, hs, fr, dl = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = walk_gif_frames(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                ws.append(None)
                hs.append(None)
                fr.append(None)
                dl.append(None)
            else:
                w, h, frames, delay = meta
                ws.append(w)
                hs.append(h)
                fr.append(frames)
                dl.append(delay)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="Int64"),
                "height": pd.Series(hs, dtype="Int64"),
                "n_frames": pd.Series(fr, dtype="Int64"),
                "total_delay_cs": pd.Series(dl, dtype="Int64"),
            }
        )


PNG_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_chunks", LongType(), True),
        StructField("n_text_chunks", LongType(), True),
        StructField("idat_bytes", LongType(), True),
        StructField("has_iend", LongType(), True),
    ]
)


def walk_png_chunks(payload: bytes) -> tuple[int, int, int, int, int, int] | None:
    """Real PNG chunk-stream walking (pure stdlib): verify the signature,
    then iterate length/type/data/CRC frames — IHDR dimensions, chunk
    census, total IDAT byte count, IEND presence. CRCs are skipped by
    LENGTH, not validated (the fast-scan convention; declared). Returns
    None for non-PNG / truncated / malformed streams."""
    import struct

    n = len(payload)
    if n < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    off = 8
    w = h = None
    n_chunks = n_text = idat = 0
    has_iend = 0
    while off + 8 <= n:
        (length,) = struct.unpack(">I", payload[off : off + 4])
        ctype = payload[off + 4 : off + 8]
        if off + 12 + length > n:
            return None
        if ctype == b"IHDR":
            if length < 13:
                return None
            w, h = struct.unpack(">II", payload[off + 8 : off + 16])
        elif ctype == b"tEXt":
            n_text += 1
        elif ctype == b"IDAT":
            idat += length
        n_chunks += 1
        off += 12 + length
        if ctype == b"IEND":
            has_iend = 1
            break
    if w is None or not has_iend:
        return None
    return int(w), int(h), n_chunks, n_text, idat, has_iend


def _png_chunks_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched PNG chunk walking; non-PNG payloads yield the
    typed-miss row."""
    for pdf in batches:
        ids, ws, hs, nc, nt, ib, ie = [], [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = walk_png_chunks(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                for lst in (ws, hs, nc, nt, ib, ie):
                    lst.append(None)
            else:
                w, h, nch, ntx, idat, iend = meta
                ws.append(w)
                hs.append(h)
                nc.append(nch)
                nt.append(ntx)
                ib.append(idat)
                ie.append(iend)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="Int64"),
                "height": pd.Series(hs, dtype="Int64"),
                "n_chunks": pd.Series(nc, dtype="Int64"),
                "n_text_chunks": pd.Series(nt, dtype="Int64"),
                "idat_bytes": pd.Series(ib, dtype="Int64"),
                "has_iend": pd.Series(ie, dtype="Int64"),
            }
        )


# ---------------------------------------------------------------------------
# TIFF IFD directory walking (both byte orders)
# ---------------------------------------------------------------------------

TIFF_IFD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("is_little_endian", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("n_entries", LongType()),
    ]
)


def walk_tiff_ifd(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Walk the first IFD of a TIFF container: detect the byte order from
    the 'II'/'MM' header, verify the magic 42, follow the IFD offset, and
    scan the 12-byte entries for ImageWidth(256)/ImageLength(257)/
    BitsPerSample(258) stored as LONG(4) or SHORT(3) values — SHORT is
    decoded from the first inline 2 bytes (the TIFF inline-value rule),
    any other entry type is skipped, so a non-canonical big-endian
    SHORT-typed dimension can never be misread as value<<16 (ADVICE
    r13). Directory walk only (tag values beyond the inline 4 bytes are
    not dereferenced). Malformed input (bad byte order, wrong magic,
    truncated IFD, missing dimension tags) is a typed miss (None),
    never an exception.
    """
    import struct

    if len(payload) < 8:
        return None
    bo = payload[:2]
    if bo == b"II":
        le, pre = 1, "<"
    elif bo == b"MM":
        le, pre = 0, ">"
    else:
        return None
    (magic,) = struct.unpack_from(pre + "H", payload, 2)
    if magic != 42:
        return None
    (ifd_off,) = struct.unpack_from(pre + "I", payload, 4)
    if ifd_off < 8 or ifd_off + 2 > len(payload):
        return None
    (n,) = struct.unpack_from(pre + "H", payload, ifd_off)
    end = ifd_off + 2 + 12 * n + 4
    if n == 0 or end > len(payload):
        return None
    width = height = bits = None
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(pre + "HHI", payload, base)
        if typ == 4:  # LONG: full 4-byte inline value
            (val,) = struct.unpack_from(pre + "I", payload, base + 8)
        elif typ == 3:  # SHORT: first 2 inline bytes, per the TIFF spec
            (val,) = struct.unpack_from(pre + "H", payload, base + 8)
        else:  # untyped/unsupported entry: never guess a width from it
            continue
        if tag == 256:
            width = val
        elif tag == 257:
            height = val
        elif tag == 258:
            bits = val
    if width is None or height is None or bits is None:
        return None
    return le, width, height, bits, n


def _tiff_ifd_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched TIFF IFD walking; malformed payloads yield the
    typed-miss row."""
    for pdf in batches:
        ids, les, ws, hs, bs, ns = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = walk_tiff_ifd(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                for lst in (les, ws, hs, bs, ns):
                    lst.append(None)
            else:
                le, w, h, b, n = meta
                les.append(le)
                ws.append(w)
                hs.append(h)
                bs.append(b)
                ns.append(n)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "is_little_endian": pd.Series(les, dtype="Int64"),
                "width": pd.Series(ws, dtype="Int64"),
                "height": pd.Series(hs, dtype="Int64"),
                "bits_per_sample": pd.Series(bs, dtype="Int64"),
                "n_entries": pd.Series(ns, dtype="Int64"),
            }
        )


# ---------------------------------------------------------------------------
# ICO directory walking
# ---------------------------------------------------------------------------

ICO_DIR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_images", LongType()),
        StructField("max_width", LongType()),
        StructField("max_height", LongType()),
        StructField("total_declared_bytes", LongType()),
    ]
)


def walk_ico_dir(payload: bytes) -> tuple[int, int, int, int] | None:
    """Walk an ICONDIR: verify reserved=0 / type=1, then scan the 16-byte
    ICONDIRENTRY records — width/height bytes (0 encodes 256, the ICO
    quirk) and the declared image byte sizes. Directory walk only: the
    image payloads are not dereferenced, so a directory whose declared
    sizes overrun the file still parses (declared, not verified, sizes —
    the fast-scan convention). Malformed headers are a typed miss.
    """
    import struct

    if len(payload) < 6:
        return None
    res, typ, cnt = struct.unpack_from("<HHH", payload, 0)
    if res != 0 or typ != 1 or cnt == 0:
        return None
    if 6 + 16 * cnt > len(payload):
        return None
    maxw = maxh = total = 0
    for i in range(cnt):
        base = 6 + 16 * i
        w = payload[base] or 256
        h = payload[base + 1] or 256
        (size,) = struct.unpack_from("<I", payload, base + 8)
        maxw = max(maxw, w)
        maxh = max(maxh, h)
        total += size
    return cnt, maxw, maxh, total


def _ico_dir_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched ICO directory walking; malformed payloads yield the
    typed-miss row."""
    for pdf in batches:
        ids, cs, ws, hs, ts = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = walk_ico_dir(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                for lst in (cs, ws, hs, ts):
                    lst.append(None)
            else:
                c, w, h, t = meta
                cs.append(c)
                ws.append(w)
                hs.append(h)
                ts.append(t)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_images": pd.Series(cs, dtype="Int64"),
                "max_width": pd.Series(ws, dtype="Int64"),
                "max_height": pd.Series(hs, dtype="Int64"),
                "total_declared_bytes": pd.Series(ts, dtype="Int64"),
            }
        )


# ---------------------------------------------------------------------------
# ZIP central-directory walking (EOCD backward scan + record walk)
# ---------------------------------------------------------------------------

ZIP_CDIR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_entries", LongType()),
        StructField("n_deflated", LongType()),
        StructField("total_compressed", LongType()),
        StructField("total_uncompressed", LongType()),
        StructField("name_bytes", LongType()),
    ]
)


def walk_zip_central_dir(
    payload: bytes,
) -> tuple[int, int, int, int, int] | None:
    """Walk a ZIP central directory: backward-scan the tail for the EOCD
    signature (PK\\x05\\x06, comment-tolerant like every real unzipper),
    read the entry count / directory size / offset, then walk the 46-byte
    central file headers (PK\\x01\\x02) collecting method, sizes and name
    lengths. Directory walk only — local headers and payload bytes are
    never dereferenced. Malformed input is a typed miss (None).
    """
    import struct

    if len(payload) < 22:
        return None
    tail_start = max(0, len(payload) - 65557)
    eocd = payload.rfind(b"PK\x05\x06", tail_start)
    if eocd < 0 or eocd + 22 > len(payload):
        return None
    (n_total,) = struct.unpack_from("<H", payload, eocd + 10)
    cd_size, cd_off = struct.unpack_from("<II", payload, eocd + 12)
    if n_total == 0 or cd_off + cd_size > len(payload):
        return None
    pos = cd_off
    n_deflated = total_c = total_u = name_bytes = 0
    for _ in range(n_total):
        if pos + 46 > len(payload) or payload[pos : pos + 4] != b"PK\x01\x02":
            return None
        (method,) = struct.unpack_from("<H", payload, pos + 10)
        csize, usize = struct.unpack_from("<II", payload, pos + 20)
        nlen, elen, clen = struct.unpack_from("<HHH", payload, pos + 28)
        if method == 8:
            n_deflated += 1
        total_c += csize
        total_u += usize
        name_bytes += nlen
        pos += 46 + nlen + elen + clen
    return n_total, n_deflated, total_c, total_u, name_bytes


def _zip_cdir_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched ZIP central-directory walking; malformed payloads
    yield the typed-miss row."""
    for pdf in batches:
        ids, ns, nd, tc, tu, nb = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = walk_zip_central_dir(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                for lst in (ns, nd, tc, tu, nb):
                    lst.append(None)
            else:
                a, b, c, d, e = meta
                ns.append(a)
                nd.append(b)
                tc.append(c)
                tu.append(d)
                nb.append(e)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_entries": pd.Series(ns, dtype="Int64"),
                "n_deflated": pd.Series(nd, dtype="Int64"),
                "total_compressed": pd.Series(tc, dtype="Int64"),
                "total_uncompressed": pd.Series(tu, dtype="Int64"),
                "name_bytes": pd.Series(nb, dtype="Int64"),
            }
        )


# ---------------------------------------------------------------------------
# FLAC STREAMINFO parsing (bit-packed fields)
# ---------------------------------------------------------------------------

FLAC_INFO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("total_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def parse_flac_streaminfo(
    payload: bytes,
) -> tuple[int, int, int, int, int] | None:
    """Parse a FLAC STREAMINFO block: verify the fLaC marker and a first
    metadata block of type 0 / length 34, then BIT-unpack the packed
    64-bit field group — sample rate (20 bits), channels-1 (3), bits per
    sample-1 (5), total samples (36) — the one container grammar here
    where fields do not align to bytes at all. duration_ms floors
    1000*total/rate (bounded: total < 2^36, no Int64 overflow possible).
    Malformed input is a typed miss (None).
    """
    import struct

    if len(payload) < 8 + 34:
        return None
    if payload[:4] != b"fLaC":
        return None
    hdr = payload[4]
    block_type = hdr & 0x7F
    (length,) = struct.unpack(">I", b"\x00" + payload[5:8])
    if block_type != 0 or length != 34:
        return None
    (packed,) = struct.unpack_from(">Q", payload, 8 + 10)
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        return None
    return rate, channels, bps, total, (1000 * total) // rate


def _flac_info_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched FLAC STREAMINFO parsing; malformed payloads yield
    the typed-miss row."""
    for pdf in batches:
        ids, rs, cs, bs, ts, ds = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = parse_flac_streaminfo(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                for lst in (rs, cs, bs, ts, ds):
                    lst.append(None)
            else:
                r, c, b, t, d = meta
                rs.append(r)
                cs.append(c)
                bs.append(b)
                ts.append(t)
                ds.append(d)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "sample_rate": pd.Series(rs, dtype="Int64"),
                "channels": pd.Series(cs, dtype="Int64"),
                "bits_per_sample": pd.Series(bs, dtype="Int64"),
                "total_samples": pd.Series(ts, dtype="Int64"),
                "duration_ms": pd.Series(ds, dtype="Int64"),
            }
        )


# ---------------------------------------------------------------------------
# WebP VP8X feature parsing (24-bit LE minus-one dimension encoding)
# ---------------------------------------------------------------------------

WEBP_VP8X_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("has_alpha", LongType()),
        StructField("has_animation", LongType()),
        StructField("riff_size", LongType()),
    ]
)


def parse_webp_vp8x(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Parse an extended-format WebP header: RIFF/WEBP container, VP8X
    chunk with the feature-flag byte (alpha bit 4, animation bit 1) and
    the canvas dimensions stored as 24-BIT LITTLE-ENDIAN MINUS-ONE values
    — the grammar quirk no other walker here has. Header walk only; the
    image-data chunks are not dereferenced. Malformed input is a typed
    miss (None).
    """
    import struct

    if len(payload) < 30:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if payload[12:16] != b"VP8X":
        return None
    (chunk_len,) = struct.unpack_from("<I", payload, 16)
    if chunk_len != 10:
        return None
    flags = payload[20]
    has_alpha = (flags >> 4) & 1
    has_anim = (flags >> 1) & 1
    w = int.from_bytes(payload[24:27], "little") + 1
    h = int.from_bytes(payload[27:30], "little") + 1
    return w, h, has_alpha, has_anim, riff_size


def _webp_vp8x_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched WebP VP8X parsing; malformed payloads yield the
    typed-miss row."""
    for pdf in batches:
        ids, ws, hs, al, an, rs = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = parse_webp_vp8x(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                for lst in (ws, hs, al, an, rs):
                    lst.append(None)
            else:
                w, h, a, m, r = meta
                ws.append(w)
                hs.append(h)
                al.append(a)
                an.append(m)
                rs.append(r)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="Int64"),
                "height": pd.Series(hs, dtype="Int64"),
                "has_alpha": pd.Series(al, dtype="Int64"),
                "has_animation": pd.Series(an, dtype="Int64"),
                "riff_size": pd.Series(rs, dtype="Int64"),
            }
        )


# ---------------------------------------------------------------------------
# ID3v2 header parsing (7-bit syncsafe integers)
# ---------------------------------------------------------------------------

ID3V2_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("version_major", LongType()),
        StructField("tag_size", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)


def _syncsafe(b: bytes) -> int | None:
    """Decode a 4-byte ID3v2 syncsafe integer (7 bits per byte, MSB of
    every byte must be 0)."""
    if len(b) != 4 or any(x & 0x80 for x in b):
        return None
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def parse_id3v2(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse an ID3v2 tag header and walk its frames: 'ID3' marker,
    version, SYNCSAFE 28-bit tag size (7 useful bits per byte — the
    unsynchronization-proof integer encoding unique to this grammar),
    then v2.3-style frames (4-byte id, 4-byte big-endian size, 2 flag
    bytes). Frame payloads are skipped by length. Malformed input is a
    typed miss (None).
    """
    import struct

    if len(payload) < 10 or payload[:3] != b"ID3":
        return None
    ver = payload[3]
    size = _syncsafe(payload[6:10])
    if size is None or 10 + size > len(payload):
        return None
    pos = 10
    end = 10 + size
    n_frames = 0
    frame_bytes = 0
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            return None
        (fsize,) = struct.unpack_from(">I", payload, pos + 4)
        if pos + 10 + fsize > end:
            return None
        n_frames += 1
        frame_bytes += fsize
        pos += 10 + fsize
    return ver, size, n_frames, frame_bytes


def _id3v2_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched ID3v2 parsing; malformed payloads yield the
    typed-miss row."""
    for pdf in batches:
        ids, vs, ts, nf, fb = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = parse_id3v2(bytes(payload))
            ids.append(doc_id)
            if meta is None:
                for lst in (vs, ts, nf, fb):
                    lst.append(None)
            else:
                v, t, n, b = meta
                vs.append(v)
                ts.append(t)
                nf.append(n)
                fb.append(b)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "version_major": pd.Series(vs, dtype="Int64"),
                "tag_size": pd.Series(ts, dtype="Int64"),
                "n_frames": pd.Series(nf, dtype="Int64"),
                "frame_bytes": pd.Series(fb, dtype="Int64"),
            }
        )


# ---------------------------------------------------------------------------
# gzip member-header parsing (flag-conditional optional fields)
# ---------------------------------------------------------------------------

GZIP_HDR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mtime", LongType()),
        StructField("has_name", LongType()),
        StructField("name_len", LongType()),
        StructField("has_comment", LongType()),
        StructField("comment_len", LongType()),
        StructField("header_len", LongType()),
    ]
)


def parse_gzip_header(
    payload: bytes,
) -> tuple[int, int, int, int, int, int] | None:
    """Parse a gzip member header (RFC 1952): magic 1f 8b, deflate method,
    the FLG byte whose bits make FEXTRA/FNAME/FCOMMENT/FHCRC fields
    conditionally PRESENT — the flag-conditional grammar the fixed-layout
    walkers don't exercise — then skip each optional field in spec order
    (null-terminated names/comments). Returns mtime, name/comment
    presence + lengths, and the total header length. Malformed input is
    a typed miss (None).
    """
    import struct

    if len(payload) < 10 or payload[:2] != b"\x1f\x8b" or payload[2] != 8:
        return None
    flg = payload[3]
    (mtime,) = struct.unpack_from("<I", payload, 4)
    pos = 10
    if flg & 0x04:  # FEXTRA
        if pos + 2 > len(payload):
            return None
        (xlen,) = struct.unpack_from("<H", payload, pos)
        pos += 2 + xlen
    name_len = 0
    if flg & 0x08:  # FNAME
        end = payload.find(b"\x00", pos)
        if end < 0:
            return None
        name_len = end - pos
        pos = end + 1
    comment_len = 0
    if flg & 0x10:  # FCOMMENT
        end = payload.find(b"\x00", pos)
        if end < 0:
            return None
        comment_len = end - pos
        pos = end + 1
    if flg & 0x02:  # FHCRC
        pos += 2
    if pos > len(payload):
        return None
    return (
        mtime,
        1 if flg & 0x08 else 0,
        name_len,
        1 if flg & 0x10 else 0,
        comment_len,
        pos,
    )


def _gzip_hdr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched gzip header parsing; malformed payloads yield the
    typed-miss row."""
    for pdf in batches:
        cols = {k: [] for k in ("doc_id", "mtime", "has_name", "name_len",
                                "has_comment", "comment_len", "header_len")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = parse_gzip_header(bytes(payload))
            cols["doc_id"].append(doc_id)
            if meta is None:
                for k in ("mtime", "has_name", "name_len", "has_comment",
                          "comment_len", "header_len"):
                    cols[k].append(None)
            else:
                for k, v in zip(
                    ("mtime", "has_name", "name_len", "has_comment",
                     "comment_len", "header_len"),
                    meta,
                ):
                    cols[k].append(v)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                **{
                    k: pd.Series(cols[k], dtype="Int64")
                    for k in ("mtime", "has_name", "name_len",
                              "has_comment", "comment_len", "header_len")
                },
            }
        )


# ---------------------------------------------------------------------------
# BSON document walking (the reference connector's native payload format)
# ---------------------------------------------------------------------------

BSON_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_elements", LongType()),
        StructField("n_int32", LongType()),
        StructField("n_int64", LongType()),
        StructField("n_strings", LongType()),
        StructField("int_value_sum", LongType()),
        StructField("string_bytes", LongType()),
    ]
)


def walk_bson_doc(
    payload: bytes,
) -> tuple[int, int, int, int, int, int] | None:
    """Walk a BSON document (the wire format of the reference connector's
    MongoDB change events — /root/reference/internal/mongo/client.go
    consumes these before the Ext-JSON serialize step this repo ports as
    functions/extjson.py): little-endian int32 total size, then elements
    of (type byte, cstring name, typed payload) for the int32 (0x10),
    int64 (0x12) and string (0x02) types, terminated by a 0x00 byte.
    Returns the element census by type, the sum of integer values and
    the total string payload bytes. Malformed input (size mismatch,
    unknown type, unterminated cstring, missing terminator) is a typed
    miss (None).
    """
    import struct

    if len(payload) < 5:
        return None
    (size,) = struct.unpack_from("<i", payload, 0)
    if size != len(payload):
        return None
    pos = 4
    n32 = n64 = nstr = 0
    int_sum = 0
    str_bytes = 0
    while pos < size - 1:
        etype = payload[pos]
        pos += 1
        end = payload.find(b"\x00", pos)
        if end < 0 or end >= size - 1:
            return None
        pos = end + 1
        if etype == 0x10:
            if pos + 4 > size - 1:
                return None
            (v,) = struct.unpack_from("<i", payload, pos)
            int_sum += v
            n32 += 1
            pos += 4
        elif etype == 0x12:
            if pos + 8 > size - 1:
                return None
            (v,) = struct.unpack_from("<q", payload, pos)
            int_sum += v
            n64 += 1
            pos += 8
        elif etype == 0x02:
            if pos + 4 > size - 1:
                return None
            (slen,) = struct.unpack_from("<i", payload, pos)
            pos += 4
            if slen < 1 or pos + slen > size - 1:
                return None
            if payload[pos + slen - 1] != 0:
                return None
            str_bytes += slen - 1
            nstr += 1
            pos += slen
        else:
            return None
    if pos != size - 1 or payload[size - 1] != 0:
        return None
    return n32 + n64 + nstr, n32, n64, nstr, int_sum, str_bytes


def _bson_doc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched BSON document walking; malformed payloads yield the
    typed-miss row."""
    for pdf in batches:
        cols = {k: [] for k in ("doc_id", "n_elements", "n_int32",
                                "n_int64", "n_strings", "int_value_sum",
                                "string_bytes")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = walk_bson_doc(bytes(payload))
            cols["doc_id"].append(doc_id)
            keys = ("n_elements", "n_int32", "n_int64", "n_strings",
                    "int_value_sum", "string_bytes")
            if meta is None:
                for k in keys:
                    cols[k].append(None)
            else:
                for k, v in zip(keys, meta):
                    cols[k].append(v)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                **{
                    k: pd.Series(cols[k], dtype="Int64")
                    for k in ("n_elements", "n_int32", "n_int64",
                              "n_strings", "int_value_sum", "string_bytes")
                },
            }
        )


# ---------------------------------------------------------------------------
# Compressed-payload decoders (round-15 bank): real DEFLATE via zlib, a
# complete GIF-LZW decompressor, and zlib-wrapped PNG IDAT with filter
# reconstruction — the payload-decode axis beyond PCM samples / BMP pixels.
# ---------------------------------------------------------------------------

DEFLATE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_sum", LongType(), True),
        StructField("byte_min", LongType(), True),
        StructField("byte_max", LongType(), True),
        StructField("stream_checksum", LongType(), True),
    ]
)


def inflate_raw(payload: bytes) -> bytes | None:
    """REAL DEFLATE decompression (zlib inflate, raw stream / wbits=-15):
    the payload is an actual RFC 1951 bit stream — fixed-Huffman or stored
    blocks — whose decode exercises zlib's canonical-Huffman table walk,
    not a container-grammar skip. Returns None for any malformed stream
    (typed miss, the multimodal-column contract)."""
    import zlib

    try:
        return zlib.decompress(payload, -15)
    except zlib.error:
        return None


def _deflate_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched inflate + decoded-byte statistics: the weighted
    checksum sum((i+1)*b_i) pins the DECOMPRESSED byte order, so a
    bit-packing error anywhere in the Huffman stream either kills the
    inflate (NULLs) or scrambles the checksum — both driver-visible."""
    for pdf in batches:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "n_bytes", "byte_sum", "byte_min", "byte_max",
            "stream_checksum")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = inflate_raw(bytes(payload))
            cols["doc_id"].append(doc_id)
            if data is None or len(data) == 0:
                for k in ("n_bytes", "byte_sum", "byte_min", "byte_max",
                          "stream_checksum"):
                    cols[k].append(None)
            else:
                cols["n_bytes"].append(len(data))
                cols["byte_sum"].append(sum(data))
                cols["byte_min"].append(min(data))
                cols["byte_max"].append(max(data))
                cols["stream_checksum"].append(
                    sum((i + 1) * b for i, b in enumerate(data))
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                **{
                    k: pd.Series(cols[k], dtype="Int64")
                    for k in ("n_bytes", "byte_sum", "byte_min",
                              "byte_max", "stream_checksum")
                },
            }
        )


def lzw_decode_gif(data: bytes, min_code_size: int) -> list[int] | None:
    """Complete GIF-flavor LZW decompressor (pure stdlib): variable code
    width starting at min_code_size+1 growing to 12 bits, CLEAR resets,
    EOI termination, LSB-first bit packing, and the KwKwK
    (code == next_code) case. Returns the decoded pixel-index list, or
    None for a malformed stream (out-of-range code / missing EOI).
    Correctness is pinned in tests against an independent compressing
    encoder driving real dictionary growth across 2/4/7-bit alphabets."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = eoi + 1
    out: list[int] = []
    prev: int | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        code = 0
        for b in range(width):
            p = bitpos + b
            code |= ((data[p // 8] >> (p % 8)) & 1) << b
        bitpos += width
        if code == clear:
            dict_ = {i: [i] for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code not in dict_:
                return None
            out.extend(dict_[code])
            prev = code
            continue
        if code in dict_:
            entry = dict_[code]
        elif code == next_code:
            entry = dict_[prev] + [dict_[prev][0]]  # KwKwK
        else:
            return None
        out.extend(entry)
        dict_[next_code] = dict_[prev] + [entry[0]]
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        prev = code
    return None  # stream exhausted without EOI


GIF_PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("index_sum", LongType(), True),
        StructField("raster_checksum", LongType(), True),
        StructField("palette_r_sum", LongType(), True),
    ]
)


def decode_gif_pixels(
    payload: bytes,
) -> tuple[int, int, list[int], list[tuple[int, int, int]]] | None:
    """REAL GIF pixel decode (pure stdlib): parse the GIF89a logical screen
    descriptor + global color table, walk to the first image descriptor,
    reassemble the LZW sub-blocks and run ``lzw_decode_gif`` on the actual
    compressed bit stream. Returns (w, h, pixel_indices, palette) or None
    for malformed payloads. Extends the container walkers
    (multimodal_gif_frame_count skips LZW sub-blocks; this decodes them)."""
    import struct

    if len(payload) < 14 or payload[:6] not in (b"GIF89a", b"GIF87a"):
        return None
    w_s, h_s, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        if len(payload) < pos + 3 * gct_len:
            return None
        for i in range(gct_len):
            palette.append(
                (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                 payload[pos + 3 * i + 2])
            )
        pos += 3 * gct_len
    while pos < len(payload):
        b = payload[pos]
        if b == 0x2C:  # image descriptor
            if len(payload) < pos + 10:
                return None
            _l, _t, iw, ih, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1:pos + 10]
            )
            pos += 10
            if ipacked & 0x80:  # local color table overrides
                lct_len = 2 << (ipacked & 0x07)
                palette = [
                    (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                     payload[pos + 3 * i + 2])
                    for i in range(lct_len)
                ]
                pos += 3 * lct_len
            if pos >= len(payload):
                return None
            min_code_size = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload):
                blen = payload[pos]
                pos += 1
                if blen == 0:
                    break
                lzw += payload[pos:pos + blen]
                pos += blen
            pixels = lzw_decode_gif(bytes(lzw), min_code_size)
            if pixels is None or len(pixels) != iw * ih:
                return None
            if palette and max(pixels) >= len(palette):
                return None
            return iw, ih, pixels, palette
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(payload):
                blen = payload[pos]
                pos += 1
                if blen == 0:
                    break
                pos += blen
        elif b == 0x3B:
            return None  # trailer before any image
        else:
            return None
    return None


def _gif_pixel_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched GIF LZW pixel decode: index sum, raster-order weighted
    checksum, and the palette-mapped red-channel sum (which only matches
    the oracle if BOTH the LZW stream and the color table were read
    correctly)."""
    cols_i = ("width", "height", "n_pixels", "index_sum",
              "raster_checksum", "palette_r_sum")
    for pdf in batches:
        cols: dict[str, list] = {k: [] for k in ("doc_id",) + cols_i}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            decoded = decode_gif_pixels(bytes(payload))
            cols["doc_id"].append(doc_id)
            if decoded is None:
                for k in cols_i:
                    cols[k].append(None)
            else:
                w, h, px, pal = decoded
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_pixels"].append(len(px))
                cols["index_sum"].append(sum(px))
                cols["raster_checksum"].append(
                    sum((i + 1) * p for i, p in enumerate(px))
                )
                cols["palette_r_sum"].append(
                    sum(pal[p][0] for p in px) if pal else None
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                **{
                    k: pd.Series(cols[k], dtype="Int64") for k in cols_i
                },
            }
        )


PNG_PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("gray_sum", LongType(), True),
        StructField("raster_checksum", LongType(), True),
    ]
)


def decode_png_gray8(payload: bytes) -> tuple[int, int, list[int]] | None:
    """REAL PNG decode for 8-bit grayscale, filters 0 (None) and 1 (Sub)
    (pure stdlib): walk the chunk grammar, concatenate IDAT, inflate the
    zlib stream with the WRAPPER checks on (wbits=15 — zlib verifies the
    adler32 our column-side arithmetic produced), then run the per-scanline
    filter RECONSTRUCTION. Returns (w, h, pixels in raster order) or None
    for malformed payloads / unsupported color types / other filters."""
    import struct
    import zlib

    if len(payload) < 45 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            return None
        if ctype == b"IHDR":
            if clen != 13:
                return None
            w, h = struct.unpack(">II", body[:8])
            bit_depth, color_type = body[8], body[9]
            if bit_depth != 8 or color_type != 0:
                return None
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + body + crc
    if not w or not h or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))  # wbits=15: adler32 verified
    except zlib.error:
        return None
    if len(raw) != h * (w + 1):
        return None
    pixels: list[int] = []
    for y in range(h):
        row = raw[y * (w + 1):(y + 1) * (w + 1)]
        ftype, data = row[0], row[1:]
        if ftype == 0:
            pixels.extend(data)
        elif ftype == 1:  # Sub: Recon(x) = Filt(x) + Recon(x-1)
            acc = 0
            for d in data:
                acc = (acc + d) % 256
                pixels.append(acc)
        else:
            return None
    return int(w), int(h), pixels


def _png_pixel_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched PNG grayscale decode: gray sum + raster-order weighted
    checksum — only match the oracle if the zlib wrapper (adler32), the
    stored-block framing AND the Sub-filter reconstruction were all
    honored."""
    cols_i = ("width", "height", "n_pixels", "gray_sum", "raster_checksum")
    for pdf in batches:
        cols: dict[str, list] = {k: [] for k in ("doc_id",) + cols_i}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            decoded = decode_png_gray8(bytes(payload))
            cols["doc_id"].append(doc_id)
            if decoded is None:
                for k in cols_i:
                    cols[k].append(None)
            else:
                w, h, px = decoded
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_pixels"].append(len(px))
                cols["gray_sum"].append(sum(px))
                cols["raster_checksum"].append(
                    sum((i + 1) * p for i, p in enumerate(px))
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                **{
                    k: pd.Series(cols[k], dtype="Int64") for k in cols_i
                },
            }
        )


RLE8_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("index_sum", LongType(), True),
        StructField("raster_checksum", LongType(), True),
        StructField("palette_r_sum", LongType(), True),
    ]
)


def decode_bmp_rle8(
    payload: bytes,
) -> tuple[int, int, list[int], list[int]] | None:
    """REAL BI_RLE8 BMP decompression (pure stdlib): parse the headers and
    the 256-entry BGRA palette, then run the full RLE8 state machine —
    encoded-mode runs [n, c], end-of-line [0,0], end-of-bitmap [0,1],
    delta [0,2,dx,dy] (skipped pixels defined as index 0, the common
    decoder convention), and absolute mode [0, k>=3, k bytes, pad to
    even]. Rows are stored BOTTOM-UP; returns (w, h, pixel indices in
    logical raster order, palette red channel) or None for malformed
    payloads. The run-length family extends the payload-decode axis
    beside entropy coding (DEFLATE), dictionary coding (LZW) and plain
    stride decode (24bpp BMP)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (offset,) = struct.unpack("<I", payload[10:14])
    bisize, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bisize != 40 or planes != 1 or bpp != 8 or compression != 1:
        return None
    if w <= 0 or h <= 0 or len(payload) < 54 + 1024:
        return None
    pal_r = [payload[54 + 4 * i + 2] for i in range(256)]  # BGRA quads
    grid = [[0] * w for _ in range(h)]  # index 0 default (delta skips)
    pos = offset
    x, y = 0, 0  # y counts STORED rows (bottom-up)
    while pos + 1 < len(payload):
        n, c = payload[pos], payload[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            for _ in range(n):
                if y >= h or x >= w:
                    return None
                grid[y][x] = c
                x += 1
        elif c == 0:  # end of line
            x, y = 0, y + 1
        elif c == 1:  # end of bitmap
            pixels = []
            for yy in range(h):  # logical top row first; stored bottom-up
                pixels.extend(grid[h - 1 - yy])
            return w, h, pixels, pal_r
        elif c == 2:  # delta
            if pos + 2 > len(payload):
                return None
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
        else:  # absolute mode: c literal bytes, padded to even
            k = c
            if pos + k > len(payload):
                return None
            for j in range(k):
                if y >= h or x >= w:
                    return None
                grid[y][x] = payload[pos + j]
                x += 1
            pos += k + (k & 1)
    return None  # ran out without end-of-bitmap


def _bmp_rle8_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    cols_i = ("width", "height", "n_pixels", "index_sum",
              "raster_checksum", "palette_r_sum")
    for pdf in batches:
        cols: dict[str, list] = {k: [] for k in ("doc_id",) + cols_i}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            decoded = decode_bmp_rle8(bytes(payload))
            cols["doc_id"].append(doc_id)
            if decoded is None:
                for k in cols_i:
                    cols[k].append(None)
            else:
                w, h, px, pal_r = decoded
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_pixels"].append(len(px))
                cols["index_sum"].append(sum(px))
                cols["raster_checksum"].append(
                    sum((i + 1) * p for i, p in enumerate(px))
                )
                cols["palette_r_sum"].append(sum(pal_r[p] for p in px))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                **{k: pd.Series(cols[k], dtype="Int64") for k in cols_i},
            }
        )


ULAW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("sum_linear", LongType(), True),
        StructField("min_linear", LongType(), True),
        StructField("max_linear", LongType(), True),
        StructField("energy", LongType(), True),
    ]
)


def decode_ulaw(payload: bytes) -> list[int] | None:
    """REAL ITU-T G.711 mu-law expansion (pure bit arithmetic, the
    telephony codec): for each byte, complement, split into sign /
    3-bit exponent / 4-bit mantissa, and expand to the 14-bit-magnitude
    linear sample ((mant << 3) + 0x84) << exp, re-biased by -0x84 —
    the same table audioop.ulaw2lin built. Returns the signed linear
    samples; None for an empty payload."""
    if not payload:
        return None
    out = []
    for b in payload:
        u = ~b & 0xFF
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
        out.append(-mag if u & 0x80 else mag)
    return out


def _ulaw_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols_i = ("n_samples", "sum_linear", "min_linear", "max_linear",
              "energy")
    for pdf in batches:
        cols: dict[str, list] = {k: [] for k in ("doc_id",) + cols_i}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            s = decode_ulaw(bytes(payload))
            cols["doc_id"].append(doc_id)
            if s is None:
                for k in cols_i:
                    cols[k].append(None)
            else:
                cols["n_samples"].append(len(s))
                cols["sum_linear"].append(sum(s))
                cols["min_linear"].append(min(s))
                cols["max_linear"].append(max(s))
                cols["energy"].append(sum(v * v for v in s))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                **{k: pd.Series(cols[k], dtype="Int64") for k in cols_i},
            }
        )


CRC32_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_sum", LongType(), True),
        StructField("crc32", LongType(), True),
    ]
)


def _crc32_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched CRC-32 via the REAL zlib.crc32 — the oracle recomputes
    the same value through its own bitwise 0xEDB88320 reduction, so the two
    implementations must agree on reflection, init and final complement."""
    import zlib

    for pdf in batches:
        ids, nb, bs, cs = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            ids.append(doc_id)
            nb.append(len(data))
            bs.append(sum(data))
            cs.append(zlib.crc32(data) & 0xFFFFFFFF)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_bytes": pd.Series(nb, dtype="Int64"),
                "byte_sum": pd.Series(bs, dtype="Int64"),
                "crc32": pd.Series(cs, dtype="Int64"),
            }
        )


UTF8_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("is_valid", LongType(), True),
        StructField("n_codepoints", LongType(), True),
        StructField("codepoint_sum", LongType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def validate_utf8(payload: bytes) -> list[int] | None:
    """STRICT structural UTF-8 validation and decode (pure arithmetic, NOT
    str.decode — the test suite pins this against codecs.utf_8 on random
    corpora): continuation-byte counting, overlong-minimality rejection
    (the C0 AF smuggling class), UTF-16 surrogate rejection (U+D800..DFFF),
    and the U+10FFFF ceiling. Returns the codepoint list, or None for any
    malformed sequence."""
    cps: list[int] = []
    i, n = 0, len(payload)
    while i < n:
        b = payload[i]
        if b < 0x80:
            cps.append(b)
            i += 1
            continue
        if b < 0xC0:
            return None  # bare continuation byte
        if b < 0xE0:
            need, cp, floor_cp = 1, b & 0x1F, 0x80
        elif b < 0xF0:
            need, cp, floor_cp = 2, b & 0x0F, 0x800
        elif b < 0xF8:
            need, cp, floor_cp = 3, b & 0x07, 0x10000
        else:
            return None
        if i + need >= n:
            return None  # truncated trailing sequence
        for j in range(1, need + 1):
            c = payload[i + j]
            if c & 0xC0 != 0x80:
                return None
            cp = (cp << 6) | (c & 0x3F)
        if cp < floor_cp:
            return None  # overlong
        if 0xD800 <= cp <= 0xDFFF:
            return None  # surrogate
        if cp > 0x10FFFF:
            return None
        cps.append(cp)
        i += need + 1
    return cps


def _utf8_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, ok, nc, sc, nb = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            ids.append(doc_id)
            nb.append(len(data))
            cps = validate_utf8(data)
            if cps is None:
                ok.append(0)
                nc.append(None)
                sc.append(None)
            else:
                ok.append(1)
                nc.append(len(cps))
                sc.append(sum(cps))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "is_valid": pd.Series(ok, dtype="Int64"),
                "n_codepoints": pd.Series(nc, dtype="Int64"),
                "codepoint_sum": pd.Series(sc, dtype="Int64"),
                "n_bytes": pd.Series(nb, dtype="Int64"),
            }
        )


TAR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("member_size", LongType(), True),
        StructField("header_checksum", LongType(), True),
        StructField("content_sum", LongType(), True),
        StructField("content_checksum", LongType(), True),
    ]
)


def _tar_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched tar parsing via the REAL stdlib tarfile module: the
    member metadata, the ustar header checksum (re-read from the octal
    field tarfile just validated) and the extracted content statistics.
    A wrong column-side checksum makes tarfile reject the archive ->
    typed NULL miss."""
    import io
    import tarfile

    for pdf in batches:
        ids, sz, ck, cs, cc = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            ids.append(doc_id)
            try:
                tf = tarfile.open(fileobj=io.BytesIO(data))
                m = tf.getmembers()[0]
                content = tf.extractfile(m).read()
                sz.append(m.size)
                ck.append(int(data[148:154], 8))
                cs.append(sum(content))
                cc.append(
                    sum((i + 1) * b for i, b in enumerate(content))
                )
            except (tarfile.TarError, ValueError, IndexError):
                sz.append(None)
                ck.append(None)
                cs.append(None)
                cc.append(None)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "member_size": pd.Series(sz, dtype="Int64"),
                "header_checksum": pd.Series(ck, dtype="Int64"),
                "content_sum": pd.Series(cs, dtype="Int64"),
                "content_checksum": pd.Series(cc, dtype="Int64"),
            }
        )


BASE32_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_sum", LongType(), True),
        StructField("stream_checksum", LongType(), True),
    ]
)


def _base32_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched base32 decode via the REAL stdlib codec
    (base64.b32decode, strict mode): wrong alphabet, casing or padding
    raises -> typed NULL miss, so the column-side 5-bit-group encoder is
    validated by the standard library's decoder."""
    import base64
    import binascii

    for pdf in batches:
        ids, nb, bs, ck = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text32"]):
            ids.append(doc_id)
            try:
                data = base64.b32decode(str(text))
                nb.append(len(data))
                bs.append(sum(data))
                ck.append(sum((i + 1) * b for i, b in enumerate(data)))
            except (binascii.Error, ValueError):
                nb.append(None)
                bs.append(None)
                ck.append(None)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_bytes": pd.Series(nb, dtype="Int64"),
                "byte_sum": pd.Series(bs, dtype="Int64"),
                "stream_checksum": pd.Series(ck, dtype="Int64"),
            }
        )

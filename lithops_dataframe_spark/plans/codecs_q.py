"""Real-codec queries — the pure-stdlib media decoders (functions/codecs.py)
proven end-to-end under the value-hash gate.

Shape of the proof: the engine path builds REAL container bytes (PNG with
zlib-compressed filtered scanlines, padded bottom-up BMP, binary PPM, GIF /
JPEG headers, RIFF/PCM-16 WAV) from a pure function of ``doc_id``, then
parses them back with the real decoders inside Arrow-batched ``mapInPandas``
tasks. The DuckDB oracle never sees the bytes — it recomputes every decoded
value (probed dimensions, per-pixel sums through inflate+unfilter, nearest-
neighbor resampled grids, PCM amplitude stats) arithmetically from the same
``doc_id`` formulas (operators/multimodal.py CODEC_* constants). Any wrong
byte in encode OR decode shifts a sum and fails the hash.

Float discipline: the emitted doubles are single IEEE divisions (and one
sqrt) of exactly-representable integer sums — bit-identical across engines,
so no rounding is needed on either side.

Scale posture: payload synthesis and decode are narrow per-row Arrow-batch
work (zero shuffle); stats are per-payload (no aggregation). At 100 TB the
same operators run over ``binaryFile``-sourced payloads instead of
synthesized ones — see mm_binaryfile_source for that ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators import multimodal as M
from lithops_dataframe_spark.plans.registry import register

_FMT = (
    "CASE (((doc_id % 6) + 6) % 6) WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'ppm' "
    "WHEN 3 THEN 'gif' WHEN 4 THEN 'jpeg' ELSE 'wav' END"
)
# dims per the shared formulas (operators/multimodal.py IMG_*): every
# image format — jpeg included since r4's real baseline codec — carries a
# decodable raster at IMG dims
_W = f"CASE WHEN (((doc_id % 6) + 6) % 6) <= 4 THEN {M.IMG_W} END"
_H = f"CASE WHEN (((doc_id % 6) + 6) % 6) <= 4 THEN {M.IMG_H} END"
_WAV_N = M.WAV_N

_PROBE_ORACLE = f"""
    SELECT doc_id,
           {_FMT} AS fmt,
           ({_W})::INT AS width,
           ({_H})::INT AS height,
           (CASE (((doc_id % 6) + 6) % 6) WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 3
                            WHEN 3 THEN 3 WHEN 4 THEN 1 ELSE 1 END)::INT AS channels,
           (CASE WHEN (((doc_id % 6) + 6) % 6) = 5 THEN {M.WAV_RATE} END)::INT AS sample_rate,
           (CASE WHEN (((doc_id % 6) + 6) % 6) = 5 THEN (({_WAV_N}) * 1000) // {M.WAV_RATE} END)::INT
               AS duration_ms
    FROM documents
"""


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.synthesize_codec_payloads(load_table(spark, sf_dir, "documents"))


@register("mm_codec_probe", oracle=_PROBE_ORACLE)
def mm_codec_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header probe across all six container formats: PNG IHDR, BMP DIB,
    GIF logical screen, JPEG SOF marker walk, PPM header, WAV fmt/data
    chunk walk — dimensions/channels/rate/duration parsed from real bytes."""
    return M.probe_payloads(_payloads(spark, sf_dir))


_PIX_ORACLE = f"""
    WITH d AS (
        SELECT doc_id,
               CASE (((doc_id % 6) + 6) % 6) WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                               WHEN 2 THEN 'ppm' ELSE 'gif' END AS fmt,
               {M.IMG_W} AS w, {M.IMG_H} AS h
        FROM documents WHERE (((doc_id % 6) + 6) % 6) < 4
    ),
    s AS (
        SELECT doc_id, fmt, w, h,
               list_sum(flatten(list_transform(range(h), y ->
                   list_transform(range(w), x -> {M.PIX})))) AS px_sum
        FROM d
    )
    SELECT doc_id, fmt, w::INT AS width, h::INT AS height,
           px_sum::BIGINT AS px_sum,
           px_sum::DOUBLE / (w * h) AS px_mean
    FROM s
"""


@register("mm_codec_pixel_stats", oracle=_PIX_ORACLE)
def mm_codec_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL image decode proven by value: PNG payloads go through zlib
    inflate + scanline unfilter, BMP through stride/padding/BGR/bottom-up
    handling, PPM through header+raster parse — and the per-pixel sums must
    equal the oracle's arithmetic replay of the gradient formula."""
    return M.decoded_pixel_stats(_payloads(spark, sf_dir))


_RESIZE_ORACLE = f"""
    WITH d AS (
        SELECT doc_id,
               CASE (((doc_id % 6) + 6) % 6) WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                               WHEN 2 THEN 'ppm' ELSE 'gif' END AS fmt,
               {M.IMG_W} AS w, {M.IMG_H} AS h
        FROM documents WHERE (((doc_id % 6) + 6) % 6) < 4
    ),
    s AS (
        SELECT doc_id, fmt, w, h,
               list_sum(flatten(list_transform(range(8), yy ->
                   list_transform(range(8), xx ->
                       ((((xx * w) // 8) * 7 + ((yy * h) // 8) * 13 + doc_id) % 251 + 251) % 251)))) AS r_sum
        FROM d
    )
    SELECT doc_id, fmt, w::INT AS width, h::INT AS height,
           r_sum::DOUBLE / 64 AS r_mean,
           ((((doc_id % 251) + 251) % 251))::INT AS r_topleft,
           (((((((7 * w) // 8) * 7 + ((7 * h) // 8) * 13 + doc_id) % 251) + 251) % 251))::INT AS r_bottomright
    FROM s
"""


@register("mm_codec_resize_real", oracle=_RESIZE_ORACLE)
def mm_codec_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel resampling (not the metadata-only fake): decode, nearest-
    neighbor resize to 8×8 with the deterministic index map, emit resampled
    mean + corners; the oracle replays the same index arithmetic."""
    return M.resize_decoded_images(_payloads(spark, sf_dir), grid=8)


_WAV_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, {_WAV_N} AS n FROM documents WHERE (((doc_id % 6) + 6) % 6) = 5
    ),
    s AS (
        SELECT doc_id, n,
               list_sum(list_transform(range(n), i -> {M.WAV_S})) AS amp_sum,
               list_sum(list_transform(range(n), i ->
                   ({M.WAV_S}) * ({M.WAV_S}))) AS amp_sq
        FROM d
    )
    SELECT doc_id,
           {M.WAV_RATE}::INT AS sample_rate,
           n::BIGINT AS n_samples,
           ((n * 1000) // {M.WAV_RATE})::INT AS duration_ms,
           amp_sum::DOUBLE / n AS amp_mean,
           sqrt(amp_sq::DOUBLE / n) AS amp_rms
    FROM s
"""


@register("mm_codec_wav_stats", oracle=_WAV_ORACLE)
def mm_codec_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: RIFF chunk walk + PCM-16 frame reinterpretation;
    amplitude mean/RMS over exact integer sums must match the oracle's
    arithmetic replay of the sample formula."""
    return M.wav_pcm_stats(_payloads(spark, sf_dir))


_JPEG_ORACLE = f"""
    SELECT doc_id,
           (8 + ((doc_id % 13) + 13) % 13)::INT AS width,
           (8 + (((doc_id * 7) % 11) + 11) % 11)::INT AS height,
           3::INT AS channels,
           TRUE AS gray_within_1,
           TRUE AS rgb444_within_3,
           TRUE AS rgb420_within_4
    FROM documents WHERE (((doc_id % 30) + 30) % 30) = 10
"""


@register("mm_codec_jpeg_roundtrip", oracle=_JPEG_ORACLE)
def mm_codec_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode (functions/jpeg.py — from-scratch Huffman
    entropy decode + IDCT, round 4; upgrades r3's header-probe-only path).
    Per 'jpeg' document three encode→decode legs run executor-side:
    grayscale with restart intervals (tolerance ±1: all-ones quant tables
    leave only DCT float rounding), RGB 4:4:4 (±3: adds the YCbCr
    transform), and RGB 4:2:0 on a smooth gradient (±4: adds chroma
    averaging + replication upsample). Lossy decode can't be replayed
    arithmetically in SQL, so the oracle pins the tolerance booleans TRUE
    and checks dims/channels exactly — the sketch-query pattern."""
    import numpy as np
    import pandas as pd

    # 'jpeg' docs are (((doc_id % 6) + 6) % 6) = 4; the deterministic 1-in-5 subset
    # (CRT: % 30 = 10) keeps the per-doc three-leg proof at a fifth of the
    # pure-Python entropy-decode cost — tolerance evidence is per-row, so
    # the subset proves the same property
    docs = load_table(spark, sf_dir, "documents").filter("pmod(doc_id, 30) = 10").select("doc_id")

    def fn(batches):
        from lithops_dataframe_spark.functions.jpeg import decode_jpeg, encode_jpeg
        from lithops_dataframe_spark.operators.multimodal import _codec_pixels

        for pdf in batches:
            rows = []
            for d in (int(v) for v in pdf["doc_id"]):
                g = _codec_pixels(d)
                h, w = g.shape
                out_g = decode_jpeg(encode_jpeg(g, restart_interval=2))
                gray_ok = int(np.abs(out_g.astype(int) - g.astype(int)).max()) <= 1
                rgb = np.stack([g, np.roll(g, 1, 0), np.roll(g, 2, 1)], axis=2)
                out_c = decode_jpeg(encode_jpeg(rgb))
                rgb_ok = int(np.abs(out_c.astype(int) - rgb.astype(int)).max()) <= 3
                yy, xx = np.mgrid[0:h, 0:w]
                smooth = (2 * xx + 3 * yy + d % 100).astype(np.uint8)
                sm = np.stack([smooth, smooth + 10, smooth + 20], axis=2).astype(np.uint8)
                out_s = decode_jpeg(encode_jpeg(sm, subsample=True, restart_interval=2))
                sub_ok = int(np.abs(out_s.astype(int) - sm.astype(int)).max()) <= 4
                rows.append((d, out_c.shape[1], out_c.shape[0], out_c.shape[2], gray_ok, rgb_ok, sub_ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "gray_within_1", "rgb444_within_3", "rgb420_within_4",
                ],
            )

    return docs.mapInPandas(
        fn,
        "doc_id long, width int, height int, channels int, "
        "gray_within_1 boolean, rgb444_within_3 boolean, rgb420_within_4 boolean",
    )


_DFT_N = 128  # analysis frame (every wav doc has >= 160 samples)
_DFT_BINS = 32

_SPECTRAL_ORACLE = f"""
    WITH d AS (SELECT doc_id FROM documents WHERE (((doc_id % 6) + 6) % 6) = 5),
    sm AS MATERIALIZED (
        SELECT doc_id,
               list_transform(range(0, {_DFT_N}), i -> ({M.WAV_S})::DOUBLE) AS s,
               list_transform(range(0, {_DFT_N}), i -> ({M.WAV_S})::BIGINT) AS si
        FROM d
    ),
    bins AS MATERIALIZED (
        SELECT doc_id, k, sqrt(re * re + im * im) AS mag
        FROM (
            SELECT doc_id, k,
                   list_reduce(list_transform(range(0, {_DFT_N}), i ->
                       s[i + 1] * cos(-2.0 * pi() * ((k * i) % {_DFT_N}) / {_DFT_N}.0)),
                       (a, b) -> a + b) AS re,
                   list_reduce(list_transform(range(0, {_DFT_N}), i ->
                       s[i + 1] * sin(-2.0 * pi() * ((k * i) % {_DFT_N}) / {_DFT_N}.0)),
                       (a, b) -> a + b) AS im
            FROM sm, UNNEST(range(1, {_DFT_BINS + 1})) AS t(k)
        )
    ),
    ml AS MATERIALIZED (
        SELECT doc_id, list(mag ORDER BY k) AS mags FROM bins GROUP BY doc_id
    ),
    dom AS MATERIALIZED (
        SELECT doc_id, k AS dominant_bin FROM (
            SELECT doc_id, k,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY mag DESC, k) AS rn
            FROM bins
        ) WHERE rn = 1
    )
    SELECT sm.doc_id,
           {_DFT_N}::INT AS n_samples,
           list_reduce(list_transform(si, v -> v * v), (a, b) -> a + b)::BIGINT
               AS energy,
           dom.dominant_bin::INT AS dominant_bin,
           list_reduce(list_transform(range(1, {_DFT_BINS + 1}), k -> k * mags[k]),
                       (a, b) -> a + b)
               / list_reduce(mags, (a, b) -> a + b) AS centroid
    FROM sm JOIN ml USING (doc_id) JOIN dom USING (doc_id)
"""


@register("mm_wav_spectral_features", oracle=_SPECTRAL_ORACLE)
def mm_wav_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION over real decoded PCM: a 128-point DFT per
    clip (magnitudes of bins 1..32) yields spectral centroid, dominant
    bin, and exact integer energy — the multimodal feature-extract stage
    with the decode step REAL (RIFF walk + PCM-16 reinterpretation), not
    stubbed. The whole pipeline is bit-identical across engines: Python's
    math.cos/sin and DuckDB's trig hit the same libm (verified 0/4096
    grid mismatches), sums fold in the same order with an exact 0.0 seed,
    so even the unrounded centroid double hash-matches — a FULL value
    oracle on a signal-processing kernel. At scale this is one
    mapInPandas pass; swap the naive DFT for numpy FFT when cross-engine
    replay isn't required."""
    import math

    import pandas as pd

    # synthesize payloads for the wav docs ONLY: the synthesizer derives
    # format/content from doc_id, so pre-filtering drops the 5/6 of
    # payloads (including pure-Python JPEG encodes) a post-filter would
    # build and discard
    docs = load_table(spark, sf_dir, "documents").filter("(((doc_id % 6) + 6) % 6) = 5")
    payloads = M.synthesize_codec_payloads(docs)

    N, B = _DFT_N, _DFT_BINS

    def fn(batches):
        from lithops_dataframe_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _rate = C.decode_wav(bytes(payload))
                s = [int(v) for v in frames[:N, 0]]
                mags = []
                for k in range(1, B + 1):
                    re = 0.0
                    im = 0.0
                    for i in range(N):
                        ang = -2.0 * math.pi * ((k * i) % N) / N
                        re += s[i] * math.cos(ang)
                        im += s[i] * math.sin(ang)
                    mags.append(math.sqrt(re * re + im * im))
                dom = 1
                best = mags[0]
                for k in range(2, B + 1):
                    if mags[k - 1] > best:
                        best = mags[k - 1]
                        dom = k
                num = 0.0
                den = 0.0
                for k in range(1, B + 1):
                    num += k * mags[k - 1]
                    den += mags[k - 1]
                energy = sum(v * v for v in s)
                rows.append((int(doc_id), N, energy, dom, num / den))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "energy", "dominant_bin", "centroid"]
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        fn, "doc_id long, n_samples int, energy bigint, dominant_bin int, centroid double"
    )

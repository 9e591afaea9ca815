"""Multimodal (image/audio/video) column plumbing (SURVEY §2.11).

Reference context: the reference handles only CSV scalars (io.py:13-88);
multimodal columns are a north-star extension. The design treats media as
**opaque binary columns plus a typed metadata struct**, processed by
Arrow-batched Pandas UDFs over ``mapInPandas`` — the shape a 100 TB
image/audio pipeline needs: payloads never transit the driver, each task
decodes its own Arrow batches, and outputs carry an explicit schema.

Decoding is a two-tier design:

1. **Real codecs** (functions/codecs.py, pure stdlib/numpy): payloads whose
   magic identifies a supported container (PNG/BMP/GIF/JPEG/PPM/PGM/WAV)
   are probed — and for PNG/BMP/PPM/PGM/WAV fully decoded — for real.
   See plans/codecs_q.py for the oracle-gated queries that prove the
   decoded values (pixel sums, resampled grids, PCM stats) byte-for-byte.
2. **Deterministic fake fallback** for unrecognized payloads, derived from
   ``md5(payload)`` — clearly marked, stable across engines, and therefore
   *oracle-checkable*: the DuckDB twin SQL (plans/multimodal_q.py)
   reproduces every fake-decoded value from the same bytes, so the whole
   Arrow/mapInPandas plumbing is verified end-to-end by the correctness
   gate even for payload types (e.g. JPEG pixels, video codecs) whose real
   decoder needs entropy-coding libraries this environment lacks.

Operators:
- :func:`media_table` — synthesize a media table from `documents`
  (payload = UTF-8 bytes of `text`; media_type cycles image/audio/video).
- :func:`decode_media` — per-row decode to typed metadata (width/height/
  duration), ``mapInPandas``.
- :func:`media_features` — fixed-size feature vector per payload
  (md5-chunk features in the fake path), ``mapInPandas``.
- :func:`resize_images` — metadata-transforming "resize" for image rows.
- :func:`frame_sample` — UDTF-shaped row explosion: one output row per
  256-char frame of each video payload.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from lithops_dataframe_spark import cache
from pyspark.sql import functions as F

from lithops_dataframe_spark.operators.util import ensure_parallelism

from lithops_dataframe_spark.functions import codecs

try:  # pragma: no cover - optional richer decoders (JPEG pixels, video)
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

#: chars per sampled video frame (fake-decode path).
FRAME_CHARS = 256
#: feature vector dimensionality (md5 yields 8 × 4-hex chunks).
FEATURE_DIM = 8

MEDIA_TYPES = ["image", "audio", "video"]


def media_table(docs: DataFrame) -> DataFrame:
    """Synthetic media table: (doc_id, uri, media_type, payload, meta).

    payload is the UTF-8 encoding of the document text — an opaque binary
    column as far as every downstream operator is concerned. media_type
    cycles by doc_id % 3. meta is a typed struct (n_bytes, lang, source).
    """
    # pmod, not %: Spark's % follows the dividend's sign, so a NEGATIVE
    # doc_id with doc_id % 3 == -1 fed element_at index 0 — an ANSI crash
    # (INVALID_INDEX_OF_ZERO) — and -2 silently back-indexed (r11 edge
    # row). The cycle is defined by the non-negative residue.
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    # A NULL-text document has no object to ingest (fetch failure): the
    # lake contract is one non-NULL binary per row — downstream decode /
    # feature / frame UDFs and the per-payload .bin writer all dereference
    # the bytes (r10 edge row). Every mm oracle (decode/features/frames/
    # resize/phash) carries the matching `text IS NOT NULL` filter (r11:
    # resize + phash were missing it — fixed).
    docs = docs.filter(F.col("text").isNotNull())
    docs = ensure_parallelism(docs)  # spread Arrow decode batches across cores
    return docs.select(
        "doc_id",
        F.concat(F.lit("synthetic://docs/"), F.col("doc_id").cast("string")).alias("uri"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def write_payload_files(media: DataFrame, out_dir: str) -> int:
    """Materialize each payload as its own ``<doc_id>.bin`` object under
    ``out_dir`` — the layout real media lakes use (one object per asset,
    metadata elsewhere) and the input ``spark.read.format("binaryFile")``
    expects.

    Writes happen EXECUTOR-side (mapInPandas pass), never through the
    driver: each task writes its own partition's payloads, so at 100 TB
    the write is as parallel as the scan (out_dir then being an object
    store prefix). Deterministic names make the write idempotent.
    Returns the number of files written (action — forces the write).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        n = 0
        for pdf in batches:
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                with open(os.path.join(out_dir, f"{int(doc_id)}.bin"), "wb") as f:
                    f.write(bytes(p))
                n += 1
        yield pd.DataFrame({"n": [n]})

    # Key-collision policy (r11 edge row: two documents sharing a doc_id):
    # an object store has ONE object per key, and last-writer-wins would
    # be whichever task flushed last — nondeterministic. The writer keeps
    # the lexicographically-smallest payload per key (binary min ==
    # memcmp order == the source text's min in any binary-collated
    # engine), so the lake layout is deterministic and idempotent.
    # Empty payloads are excluded BEFORE the min (ADVICE r11): a zero-byte
    # object never round-trips (Spark's binaryFile source emits no row for
    # a zero-length file), and an empty duplicate would otherwise shadow a
    # real payload as the binary min — the writer's contract is "smallest
    # NON-EMPTY payload per key; keys with only empty payloads get no
    # object", matching every read-back oracle's filter-before-min order.
    dedup = (
        media.select("doc_id", "payload")
        .filter(F.length("payload") > 0)
        .groupBy("doc_id")
        .agg(F.min("payload").alias("payload"))
    )
    counts = dedup.mapInPandas(fn, "n long").collect()
    return int(sum(r.n for r in counts))


def read_binary_files(spark, path: str, *, pattern: str | None = None) -> DataFrame:
    """``spark.read.format("binaryFile")`` wrapper: one row per object with
    (path, modificationTime, length, content). The standard Spark source
    for raw media objects — splits by file, prunes ``content`` when only
    metadata is selected, and applies ``pathGlobFilter`` push-down."""
    reader = spark.read.format("binaryFile")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    return reader.load(path)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, duration_ms) from md5.

    NOT a real decoder — stands in for PIL/av in this environment; the
    DuckDB oracle reproduces these exact values from the same bytes.
    """
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[0:4], 16) % 1024
    height = 16 + int(h[4:8], 16) % 1024
    duration_ms = int(h[8:13], 16) % 600_000
    return width, height, duration_ms


_DECODE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, duration_ms int, n_bytes long"
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched ``mapInPandas``.

    Recognized containers (codecs.probe_media magic sniff) yield REAL
    header metadata; opaque payloads fall back to the deterministic fake.
    image → (width, height, null); audio → (null, null, duration);
    video → (width, height, duration). Batch-at-a-time, schema-declared.
    """

    def _dims(b: bytes) -> tuple[int, int, int]:
        info = codecs.probe_media(b)
        if info is None:
            return _fake_dims(b)
        return (
            info["width"] or 0,
            info["height"] or 0,
            info["duration_ms"] if info["duration_ms"] is not None else 0,
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_dims(bytes(p)) for p in pdf["payload"]]
            mt = pdf["media_type"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": mt,
                    "width": [
                        w if t in ("image", "video") else None for (w, _, _), t in zip(dims, mt)
                    ],
                    "height": [
                        h if t in ("image", "video") else None for (_, h, _), t in zip(dims, mt)
                    ],
                    "duration_ms": [
                        d if t in ("audio", "video") else None for (_, _, d), t in zip(dims, mt)
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(fn, _DECODE_SCHEMA)


def media_features(media: DataFrame) -> DataFrame:
    """Fixed-size feature vector per payload (f0..f7 in [0,1], 6 decimals).

    Fake path: 4-hex md5 chunks / 65535 — deterministic stand-in for a
    real embedding model; the Arrow batch shape and declared schema are
    exactly what a model-backed extractor would use.
    """
    schema = "doc_id long, " + ", ".join(f"f{i} double" for i in range(FEATURE_DIM))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hexes = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
            out = {"doc_id": pdf["doc_id"]}
            for i in range(FEATURE_DIM):
                out[f"f{i}"] = [round(int(h[4 * i : 4 * i + 4], 16) / 65535, 6) for h in hexes]
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(fn, schema)


def resize_images(media: DataFrame, *, max_side: int = 128) -> DataFrame:
    """'Resize' image rows: halve dimensions until both fit max_side.

    Fake path transforms metadata only (payload untouched); the REAL
    pixel-resampling path for decodable payloads is
    :func:`resize_decoded_images` (oracle-gated in plans/codecs_q.py).
    """
    schema = "doc_id long, width int, height int, out_width int, out_height int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = _fake_dims(bytes(p))
                ow, oh = w, h
                while ow > max_side or oh > max_side:
                    ow, oh = max(1, ow // 2), max(1, oh // 2)
                rows.append((doc_id, w, h, ow, oh))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "out_width", "out_height"])

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "payload")
        .mapInPandas(fn, schema)
    )


def frame_sample(media: DataFrame) -> DataFrame:
    """Sample 'frames' from video payloads — UDTF-shaped (1 row → N rows).

    Fake path: consecutive FRAME_CHARS-char slices of the payload text,
    each fingerprinted with md5. A real implementation would emit decoded
    keyframes (needs a video codec this environment lacks); the
    explosion/batching/schema shape is identical.
    """
    schema = "doc_id long, frame_idx int, frame_chars int, frame_md5 string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                # char-based slicing of the ASCII payload (parity with SQL substr)
                s = bytes(p).decode("utf-8")
                for i in range(math.ceil(len(s) / FRAME_CHARS)):
                    frame = s[i * FRAME_CHARS : (i + 1) * FRAME_CHARS]
                    rows.append(
                        (doc_id, i, len(frame), hashlib.md5(frame.encode("utf-8")).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_chars", "frame_md5"])

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
        .mapInPandas(fn, schema)
    )


# ---------------------------------------------------------------------------
# REAL codec path (functions/codecs.py): payload synthesis + probe/decode
# ---------------------------------------------------------------------------
# Deterministic construction formulas, shared verbatim with the DuckDB
# oracles in plans/codecs_q.py. Everything below is a pure function of
# doc_id, so the oracle can recompute every decoded value arithmetically
# while the engine path goes the long way: build real container bytes →
# parse them back with the real decoder.
CODEC_FORMATS = ["png", "bmp", "ppm", "gif", "jpeg", "wav"]
#: decodable-image dims: small enough that the oracle's per-pixel replay
#: stays cheap at sf0.1 (≤ 20×18 px/doc)
# Non-negative residues (((e % m) + m) % m) so the SQL twins agree with
# Python's % on NEGATIVE doc_ids (r11 edge row: DuckDB/Spark % follow the
# dividend's sign; the content formulas are defined by Python's pmod)
IMG_W = "8 + ((doc_id % 13) + 13) % 13"
IMG_H = "8 + (((doc_id * 7) % 11) + 11) % 11"
#: legacy header-only dims (kept for hand-built probe tests)
HDR_W = "64 + ((doc_id % 512) + 512) % 512"
HDR_H = "64 + (((doc_id * 3) % 512) + 512) % 512"
#: gradient pixel value at (y, x)
PIX = "(((x * 7 + y * 13 + doc_id) % 251) + 251) % 251"
#: WAV: mono PCM-16 at 8 kHz; sample i value and sample count
WAV_RATE = 8000
WAV_N = "160 + (((doc_id % 50) + 50) % 50) * 4"
WAV_S = "(((doc_id * 31 + i * 17) % 4096) + 4096) % 4096 - 2048"


def _codec_pixels(doc_id: int) -> "np.ndarray":
    import numpy as np

    w = 8 + doc_id % 13
    h = 8 + (doc_id * 7) % 11
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13 + doc_id) % 251).astype(np.uint8)


def _codec_payload(doc_id: int) -> bytes:
    """Real container bytes for doc_id per the shared formulas."""
    import numpy as np

    fmt = CODEC_FORMATS[doc_id % 6]
    if fmt in ("png", "bmp", "ppm", "gif"):
        g = _codec_pixels(doc_id)
        if fmt == "png":
            return codecs.encode_png(g)
        if fmt == "bmp":
            return codecs.encode_bmp(g)  # gray replicated to RGB
        if fmt == "gif":
            return codecs.encode_gif(g)  # real LZW-packed image block
        return codecs.encode_ppm(g)
    if fmt == "jpeg":
        # real baseline JPEG raster (r4 — was a header-only stream before
        # functions/jpeg.py existed); same gradient formula as the other
        # image formats, restart intervals on to exercise that path
        return codecs.encode_jpeg(_codec_pixels(doc_id), restart_interval=4)
    n = 160 + (doc_id % 50) * 4
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 31 + i * 17) % 4096 - 2048).astype(np.int16)
    return codecs.encode_wav(samples, WAV_RATE)


def synthesize_codec_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, fmt, payload): one REAL media container per document —
    format cycles png/bmp/ppm/gif/jpeg/wav by doc_id, content derived from
    doc_id by the shared formulas. Built executor-side in Arrow batches;
    payload bytes never transit the driver."""
    docs = ensure_parallelism(docs)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "fmt": [CODEC_FORMATS[d % 6] for d in ids],
                    "payload": [_codec_payload(d) for d in ids],
                }
            )

    return docs.select("doc_id").mapInPandas(fn, "doc_id long, fmt string, payload binary")


def probe_payloads(media: DataFrame) -> DataFrame:
    """Real header probe over binary payloads (the fast metadata pass every
    media lake runs before full decode): (doc_id, fmt, width, height,
    channels, sample_rate, duration_ms). Unrecognized payloads yield a NULL
    fmt row rather than an error — probe is a total function at 100 TB."""
    schema = (
        "doc_id long, fmt string, width int, height int, channels int, "
        "sample_rate int, duration_ms int"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                info = codecs.probe_media(bytes(p)) or {}
                rows.append(
                    (
                        int(doc_id),
                        info.get("format"),
                        info.get("width"),
                        info.get("height"),
                        info.get("channels"),
                        info.get("sample_rate"),
                        info.get("duration_ms"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height", "channels", "sample_rate", "duration_ms",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(fn, schema)


def decoded_pixel_stats(media: DataFrame) -> DataFrame:
    """FULL image decode (PNG inflate+unfilter / BMP / PPM) → per-image
    pixel statistics over the grayscale plane: (doc_id, fmt, width, height,
    px_sum, px_mean). Proves the real decoders end-to-end — a single wrong
    byte anywhere in inflate/unfilter/stride/channel handling moves px_sum."""
    schema = "doc_id long, fmt string, width int, height int, px_sum long, px_mean double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, fmt, p in zip(pdf["doc_id"], pdf["fmt"], pdf["payload"]):
                arr = codecs.decode_image(bytes(p))
                if arr.ndim == 3:  # replicated-gray RGB → exact gray plane
                    arr = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
                h, w = arr.shape
                s = int(arr.astype(np.int64).sum())
                # single IEEE division of exact ints — bit-identical to the
                # oracle's px_sum::DOUBLE / (w*h); no rounding needed
                rows.append((int(doc_id), fmt, w, h, s, s / (w * h)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "width", "height", "px_sum", "px_mean"]
            )

    return (
        media.filter(F.col("fmt").isin("png", "bmp", "ppm", "gif"))
        .select("doc_id", "fmt", "payload")
        .mapInPandas(fn, schema)
    )


def resize_decoded_images(media: DataFrame, *, grid: int = 8) -> DataFrame:
    """REAL pixel resampling: decode → nearest-neighbor resize to
    ``grid×grid`` → emit the resampled mean and corner values. The
    deterministic index map (out[y,x] = in[y*h//grid, x*w//grid]) keeps the
    resampled grid exactly SQL-replayable."""
    schema = (
        "doc_id long, fmt string, width int, height int, "
        "r_mean double, r_topleft int, r_bottomright int"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, fmt, p in zip(pdf["doc_id"], pdf["fmt"], pdf["payload"]):
                arr = codecs.decode_image(bytes(p))
                if arr.ndim == 3:
                    arr = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
                h, w = arr.shape
                small = codecs.resize_nearest(arr.astype(np.int64), grid, grid)
                rows.append(
                    (
                        int(doc_id),
                        fmt,
                        w,
                        h,
                        int(small.sum()) / (grid * grid),
                        int(small[0, 0]),
                        int(small[grid - 1, grid - 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height", "r_mean", "r_topleft", "r_bottomright"],
            )

    return (
        media.filter(F.col("fmt").isin("png", "bmp", "ppm", "gif"))
        .select("doc_id", "fmt", "payload")
        .mapInPandas(fn, schema)
    )


def wav_pcm_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode: parse RIFF chunks, reinterpret PCM-16 frames →
    (doc_id, sample_rate, n_samples, duration_ms, amp_mean, amp_rms).
    Integer sums are exact; the single double division/sqrt at the end is
    IEEE-identical across engines, so the values hash-match the oracle."""
    schema = (
        "doc_id long, sample_rate int, n_samples long, duration_ms int, "
        "amp_mean double, amp_rms double"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                frames, rate = codecs.decode_wav(bytes(p))
                mono = frames[:, 0].astype("int64")
                n = len(mono)
                s, sq = int(mono.sum()), int((mono * mono).sum())
                rows.append(
                    (
                        int(doc_id),
                        rate,
                        n,
                        n * 1000 // rate,
                        s / n,
                        math.sqrt(sq / n),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "duration_ms", "amp_mean", "amp_rms"],
            )

    return (
        media.filter(F.col("fmt") == "wav").select("doc_id", "payload").mapInPandas(fn, schema)
    )


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection (aHash family)
# ---------------------------------------------------------------------------
#: aHash geometry: 64 bits in 4×16-bit blocks; pigeonhole candidate join is
#: sound for hamming <= PHASH_HAM_T because T < PHASH_BLOCKS guarantees at
#: least one block matches exactly.
PHASH_BITS = 64
PHASH_BLOCKS = 4
PHASH_BLOCK_BITS = 16
PHASH_HAM_T = 3


def with_phash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach ``phash_blocks`` (array of PHASH_BLOCKS 16-bit ints): the
    average-hash (aHash) of the payload byte stream — sample 64 evenly
    spaced hex digits, threshold each against their mean, pack sign bits.

    This IS the real aHash algorithm; in a real-decoder deployment the
    input stream is the decoded/downscaled pixel grid instead of raw
    payload hex — only the sampled stream changes, the plan (narrow map,
    no UDF, no shuffle) stands. Kept as a JVM-side expression so the
    DuckDB oracle replays it bit-for-bit.
    """
    bits = PHASH_BITS
    v_sql = (
        f"transform(sequence(0, {bits - 1}), i -> "
        f"CAST(conv(substring(__hx, 1 + ((i * length(__hx)) div {bits}), 1), 16, 10) AS INT))"
    )
    blocks_sql = (
        f"transform(sequence(0, {PHASH_BLOCKS - 1}), k -> "
        f"aggregate(sequence(0, {PHASH_BLOCK_BITS - 1}), 0, (acc, j) -> "
        f"acc + IF(element_at(__v, k * {PHASH_BLOCK_BITS} + j + 1) > __mean, shiftleft(1, j), 0)))"
    )
    return (
        df.withColumn("__hx", F.upper(F.hex(F.col(payload_col))))
        .withColumn("__v", F.expr(v_sql))
        .withColumn("__mean", F.expr(f"aggregate(__v, 0, (a, b) -> a + b) / {float(bits)}"))
        .withColumn("phash_blocks", F.expr(blocks_sql))
        .drop("__hx", "__v", "__mean")
    )


def phash_neardup_pairs(media: DataFrame, *, max_hamming: int = PHASH_HAM_T) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance:
    (id_a, id_b, hamming) for image rows with distance <= max_hamming.

    Scale shape (same discipline as SimHash text dedup): each image posts
    PHASH_BLOCKS (block_idx, block_value) keys; candidates come from an
    equi-join on those compact int keys (pigeonhole-sound for
    max_hamming < PHASH_BLOCKS); exact hamming re-ranks candidates only.
    No all-pairs work at any scale.
    """
    if max_hamming >= PHASH_BLOCKS:
        raise ValueError("pigeonhole candidate join requires max_hamming < PHASH_BLOCKS")
    from pyspark import StorageLevel

    # the hash frame feeds FOUR join branches (both self-join sides + both
    # re-rank sides); without materialization each branch re-evaluates the
    # full payload-hash expression tree — measured 150 s vs 5 s at sf0.1
    imgs = (
        with_phash(media.filter(F.col("media_type") == "image"))
        .select("doc_id", "phash_blocks")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cache.track(imgs)
    post = imgs.select(
        "doc_id",
        F.posexplode("phash_blocks").alias("k", "blk"),
    )
    a, c = post.alias("a"), post.alias("c")
    cand = (
        a.join(c, (F.col("a.k") == F.col("c.k")) & (F.col("a.blk") == F.col("c.blk")))
        .filter(F.col("a.doc_id") < F.col("c.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("c.doc_id").alias("id_b"))
        .distinct()
    )
    ba = imgs.select(F.col("doc_id").alias("id_a"), F.col("phash_blocks").alias("blocks_a"))
    bb = imgs.select(F.col("doc_id").alias("id_b"), F.col("phash_blocks").alias("blocks_b"))
    ham = F.aggregate(
        F.zip_with(F.col("blocks_a"), F.col("blocks_b"), lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
    return (
        cand.join(ba, "id_a")
        .join(bb, "id_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

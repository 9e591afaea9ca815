"""Codec-layer unit tests: every decoder is exercised against bytes built
by the matching encoder AND against independently hand-constructed payloads
(so an encoder/decoder bug pair can't cancel out)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lithops_dataframe_spark.functions import codecs as C


def gradient(h: int, w: int, seed: int = 0) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13 + seed) % 251).astype(np.uint8)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_roundtrip_gray():
    img = gradient(19, 23, 5)
    data = C.encode_png(img)
    info = C.probe_media(data)
    assert (info["format"], info["width"], info["height"]) == ("png", 23, 19)
    np.testing.assert_array_equal(C.decode_image(data), img)


def test_png_roundtrip_rgb_rgba():
    rgb = np.dstack([gradient(11, 13, s) for s in (0, 50, 100)])
    np.testing.assert_array_equal(C.decode_image(C.encode_png(rgb)), rgb)
    rgba = np.dstack([gradient(7, 9, s) for s in (0, 1, 2, 3)])
    np.testing.assert_array_equal(C.decode_image(C.encode_png(rgba)), rgba)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a grayscale PNG whose row y uses filter ftypes[y] —
    independent of encode_png, so the unfilter paths are tested for real."""
    h, w = img.shape
    lines = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        ft = ftypes[y]
        enc = np.zeros(w, dtype=np.int32)
        for x in range(w):
            a = int(cur[x - 1]) if x >= 1 else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x >= 1 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(cur[x]) - pred) & 0xFF
        lines += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_unfilter():
    img = gradient(10, 16, 42)
    data = _png_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    np.testing.assert_array_equal(C.decode_image(data), img)


def test_png_palette():
    # hand-build a 2x3 palette image: PLTE of 4 colors, indices 0..3
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    scan = b"".join(bytes([0]) + idx[y].tobytes() for y in range(2))

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(C.decode_image(data), palette[idx])


# ---------------------------------------------------------------------------
# BMP / PPM / PGM
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_with_padding():
    # w=5 → row stride 15 → padded to 16: exercises the 4-byte padding path
    rgb = np.dstack([gradient(6, 5, s) for s in (1, 2, 3)])
    data = C.encode_bmp(rgb)
    info = C.probe_media(data)
    assert (info["format"], info["width"], info["height"]) == ("bmp", 5, 6)
    np.testing.assert_array_equal(C.decode_image(data), rgb)


def test_bmp_topdown():
    rgb = np.dstack([gradient(4, 4, s) for s in (0, 9, 18)])
    # encoder stores rgb[::-1] bottom-up → file rows are in rgb order;
    # flipping the height sign declares those rows top-down → decodes to rgb
    data = bytearray(C.encode_bmp(rgb[::-1]))
    struct.pack_into("<i", data, 22, -4)
    np.testing.assert_array_equal(C.decode_image(bytes(data)), rgb)


def test_pnm_roundtrip_and_comment_header():
    g = gradient(9, 7, 3)
    np.testing.assert_array_equal(C.decode_image(C.encode_pgm(g)), g)
    rgb = np.dstack([g, g, g])
    np.testing.assert_array_equal(C.decode_image(C.encode_ppm(rgb)), rgb)
    with_comment = b"P5\n# a comment\n7 9\n255\n" + g.tobytes()
    np.testing.assert_array_equal(C.decode_image(with_comment), g)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_stereo():
    mono = (np.arange(400, dtype=np.int64) * 37 % 4096 - 2048).astype(np.int16)
    data = C.encode_wav(mono, 8000)
    info = C.probe_media(data)
    assert (info["format"], info["sample_rate"], info["channels"]) == ("wav", 8000, 1)
    assert info["duration_ms"] == 400 * 1000 // 8000
    frames, rate = C.decode_wav(data)
    assert rate == 8000
    np.testing.assert_array_equal(frames[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1)
    frames2, _ = C.decode_wav(C.encode_wav(stereo, 44100))
    np.testing.assert_array_equal(frames2, stereo)


def test_wav_odd_chunk_padding():
    # RIFF chunks are word-aligned: insert an odd-sized LIST chunk before data
    mono = np.array([1, -2, 3], dtype=np.int16)
    base = C.encode_wav(mono, 16000)
    fmt_chunk = base[12 : 12 + 8 + 16]
    data_chunk = base[12 + 8 + 16 :]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3-byte body + pad
    body = fmt_chunk + odd + data_chunk
    out = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    frames, rate = C.decode_wav(out)
    np.testing.assert_array_equal(frames[:, 0], mono)


# ---------------------------------------------------------------------------
# probe-only formats + unknowns
# ---------------------------------------------------------------------------


def test_gif_and_jpeg_probe():
    info = C.probe_media(C.encode_gif_header(321, 99))
    assert (info["format"], info["width"], info["height"]) == ("gif", 321, 99)
    info = C.probe_media(C.encode_jpeg_header(640, 480))
    assert (info["format"], info["width"], info["height"]) == ("jpeg", 640, 480)


def test_gif_roundtrip():
    # > 254 px so the periodic clear-code path is exercised, and > 255
    # bytes of LZW payload so block splitting is exercised
    img = gradient(20, 30, 11)
    data = C.encode_gif(img)
    info = C.probe_media(data)
    assert (info["format"], info["width"], info["height"]) == ("gif", 30, 20)
    np.testing.assert_array_equal(C.decode_image(data), img)


def test_gif_lzw_compressed_stream_kwkwk():
    # hand-built COMPRESSED stream (our encoder emits literals only):
    # 4-color palette, min code 2 → clear=4, end=5, width 3.
    # pixels [1,1,1]: encoder emits clear,1,6,end where 6 is the KwKwK
    # case (code == next table entry) → decodes to "1"+"11".
    import struct as st

    head = b"GIF89a" + st.pack("<HHBBB", 3, 1, 0x80 | 0x01, 0, 0)  # 4-color GCT
    gct = bytes([0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30])
    desc = b"\x2c" + st.pack("<HHHHB", 0, 0, 3, 1, 0)
    codes = [(4, 3), (1, 3), (6, 3), (5, 3)]
    acc = n = 0
    payload = bytearray()
    for code, wd in codes:
        acc |= code << n
        n += wd
        while n >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        payload.append(acc & 0xFF)
    data = head + gct + desc + bytes([2, len(payload)]) + bytes(payload) + b"\x00\x3b"
    out = C.decode_image(data)
    np.testing.assert_array_equal(out, np.array([[10, 10, 10]], dtype=np.uint8))


def _pack_lsb(codes):
    """Pack (code, width) pairs LSB-first into GIF LZW payload bytes."""
    acc = n = 0
    payload = bytearray()
    for code, wd in codes:
        acc |= code << n
        n += wd
        while n >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        payload.append(acc & 0xFF)
    return bytes(payload)


def _greedy_gif(img):
    """Encode (h, w) uint8 via the CANONICAL greedy GIF-LZW (string table,
    variable width, NO periodic clears) — the stream shape real encoders
    emit, unlike encode_gif's literals-only scheme."""
    import struct as st

    h, w = img.shape
    min_code = 8
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {bytes([i]): i for i in range(1 << min_code)}
    next_code = end + 1
    codes = [(clear, width)]
    s = b""
    for px in img.flatten().tolist():
        ns = s + bytes([px])
        if ns in table:
            s = ns
            continue
        codes.append((table[s], width))
        table[ns] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        s = bytes([px])
    codes.append((table[s], width))
    codes.append((end, width))
    payload = _pack_lsb(codes)
    head = b"GIF89a" + st.pack("<HHBBB", w, h, 0xF7, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, 0)
    blocks = bytearray([min_code])
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return head + gct + bytes(desc) + bytes(blocks) + b"\x3b"


def test_gif_greedy_lzw_width_boundary():
    # 40x40 de-correlated 256-color image, greedy-compressed with no
    # clears: the string table crosses the 9->10 (512) and 10->11 (1024)
    # width boundaries — the decoder must widen when its NEXT free slot
    # reaches 2^width (one entry before the naive > check fires), else it
    # desyncs right at code 512.
    img = ((np.arange(1600) * 193 + 71) % 256).astype(np.uint8).reshape(40, 40)
    out = C.decode_image(_greedy_gif(img))
    np.testing.assert_array_equal(out, img)


def test_gif_subimage_offset_compose():
    # image descriptor smaller than + offset within the logical screen:
    # decode must reshape with the DESCRIPTOR dims and compose onto a
    # background-index canvas at (left, top)
    import struct as st

    inner = np.array([[5, 6], [7, 8]], dtype=np.uint8)
    head = b"GIF89a" + st.pack("<HHBBB", 4, 3, 0xF7, 2, 0)  # bg index 2
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + st.pack("<HHHHB", 1, 1, 2, 2, 0)  # left=1, top=1, 2x2
    min_code = 8
    codes = [(256, 9)] + [(int(p), 9) for p in inner.flatten()] + [(257, 9)]
    payload = _pack_lsb(codes)
    data = head + gct + desc + bytes([min_code, len(payload)]) + payload + b"\x00\x3b"
    out = C.decode_image(data)
    expect = np.full((3, 4), 2, dtype=np.uint8)
    expect[1:3, 1:3] = inner
    np.testing.assert_array_equal(out, expect)


def test_bmp_core_header_decode():
    # BITMAPCOREHEADER (dib_size 12): 16-bit dims, bpp at offset 24, no
    # compression field — previously misparsed with INFOHEADER offsets
    import struct as st

    img = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)  # 1x2 RGB
    row = bytes([30, 20, 10, 60, 50, 40])  # BGR
    row += b"\x00" * ((-len(row)) % 4)
    core = st.pack("<IhhHH", 12, 2, 1, 1, 24)
    hdr = st.pack("<2sIHHI", b"BM", 14 + 12 + len(row), 0, 0, 14 + 12)
    out = C.decode_image(hdr + core + row)
    np.testing.assert_array_equal(out, img)
    info = C.probe_media(hdr + core + row)
    assert (info["format"], info["width"], info["height"]) == ("bmp", 2, 1)


def test_unknown_payloads_probe_none():
    assert C.probe_media(b"key agg row scan slow fast table") is None
    assert C.probe_media(b"") is None
    assert C.probe_media(b"P6 notdigits") is None
    assert C.probe_media(b"RIFFxxxxAVI ") is None
    # text that happens to start with "BM" must not sniff as an image
    assert C.probe_media(b"BM wordy text payload that keeps going on") is None


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_resize_nearest_index_map():
    img = gradient(10, 14, 0)
    out = C.resize_nearest(img, 4, 5)
    assert out.shape == (5, 4)
    for y in range(5):
        for x in range(4):
            assert out[y, x] == img[(y * 10) // 5, (x * 14) // 4]


def test_ahash_real_pixels_neardup():
    img = gradient(32, 32, 7)
    h1 = C.ahash_bits(img)
    # tiny perturbation → tiny hamming distance; unrelated image → large
    near = img.copy()
    near[0, 0] = (int(near[0, 0]) + 3) % 251
    h2 = C.ahash_bits(near)
    far = C.ahash_bits(np.random.RandomState(1).randint(0, 255, (32, 32)).astype(np.uint8))
    ham_near = bin(h1 ^ h2).count("1")
    ham_far = bin(h1 ^ far).count("1")
    assert ham_near <= 2
    assert ham_far > 10


# ---------------------------------------------------------------------------
# JPEG (functions/jpeg.py — round 4)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_gray_near_lossless():
    # all-ones quant tables: only DCT float rounding remains
    img = gradient(40, 56, 9)
    out = C.decode_image(C.encode_jpeg(img))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_roundtrip_random_gray():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (17, 23)).astype(np.uint8)  # non-multiple-of-8
    out = C.decode_jpeg(C.encode_jpeg(img))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_roundtrip_rgb444():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 31, 3)).astype(np.uint8)
    out = C.decode_jpeg(C.encode_jpeg(img))
    assert out.shape == img.shape
    # YCbCr forward+inverse adds ~1 count on top of DCT rounding
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_jpeg_restart_intervals():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (40, 40)).astype(np.uint8)  # 25 MCUs, RSTn cycle
    data = C.encode_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI emitted
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = C.decode_jpeg(data)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_subsample_420_smooth():
    y, x = np.mgrid[0:33, 0:34]
    g = (2 * x + 3 * y + 17).astype(np.uint8)
    img = np.stack([g, g + 10, g + 20], axis=2).astype(np.uint8)
    out = C.decode_jpeg(C.encode_jpeg(img, subsample=True, restart_interval=2))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4


def test_jpeg_probe_consistency_and_errors():
    img = gradient(16, 16, 1)
    data = C.encode_jpeg(img)
    info = C.probe_media(data)
    assert (info["format"], info["width"], info["height"]) == ("jpeg", 16, 16)
    # header-only stream (no scan) now fails with ValueError, not probe-only
    with pytest.raises(ValueError, match="no scan data"):
        C.decode_image(C.encode_jpeg_header(4, 4))
    # progressive SOF2 is a declared capability boundary
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="baseline"):
        C.decode_jpeg(prog)

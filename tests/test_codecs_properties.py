"""Property-based codec tests: random arrays must round-trip every
encoder/decoder pair exactly, for arbitrary shapes and content — the
corners (1×1 images, extreme values, odd widths that stress BMP padding
and GIF clear-code boundaries) that example tests under-sample."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lithops_dataframe_spark.functions import codecs as C


def arrays(max_side: int):
    return st.tuples(
        st.integers(1, max_side), st.integers(1, max_side), st.integers(0, 2**32 - 1)
    ).map(
        lambda t: np.random.RandomState(t[2]).randint(0, 256, (t[0], t[1])).astype(np.uint8)
    )


@settings(max_examples=25, deadline=None)
@given(arrays(40))
def test_png_gray_roundtrip_property(img):
    assert np.array_equal(C.decode_image(C.encode_png(img)), img)


@settings(max_examples=15, deadline=None)
@given(arrays(24), st.integers(0, 2**31 - 1))
def test_png_rgb_roundtrip_property(g, seed):
    rgb = np.random.RandomState(seed).randint(0, 256, (*g.shape, 3)).astype(np.uint8)
    assert np.array_equal(C.decode_image(C.encode_png(rgb)), rgb)


@settings(max_examples=25, deadline=None)
@given(arrays(40))
def test_bmp_roundtrip_property(img):
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    assert np.array_equal(C.decode_image(C.encode_bmp(img)), rgb)


@settings(max_examples=25, deadline=None)
@given(arrays(40))
def test_gif_roundtrip_property(img):
    # covers clear-code boundaries (any h*w around multiples of 254) and
    # LZW block splitting for larger images
    assert np.array_equal(C.decode_image(C.encode_gif(img)), img)


@settings(max_examples=25, deadline=None)
@given(arrays(40))
def test_pnm_roundtrip_property(img):
    assert np.array_equal(C.decode_image(C.encode_pgm(img)), img)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    assert np.array_equal(C.decode_image(C.encode_ppm(rgb)), rgb)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 2000),
    st.integers(1, 4),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    frames = (
        np.random.RandomState(seed).randint(-32768, 32768, (n, ch)).astype(np.int16)
    )
    out, r = C.decode_wav(C.encode_wav(frames, rate))
    assert r == rate
    assert np.array_equal(out, frames)
    info = C.probe_media(C.encode_wav(frames, rate))
    assert info["n_frames"] == n and info["channels"] == ch


@settings(max_examples=25, deadline=None)
@given(arrays(64), st.integers(1, 16), st.integers(1, 16))
def test_resize_nearest_property(img, ow, oh):
    out = C.resize_nearest(img, ow, oh)
    assert out.shape == (oh, ow)
    h, w = img.shape
    # spot-check the index map on the corners
    assert out[0, 0] == img[0, 0]
    assert out[oh - 1, ow - 1] == img[((oh - 1) * h) // oh, ((ow - 1) * w) // ow]


@given(arrays(40))
@settings(max_examples=30, deadline=None)
def test_jpeg_gray_roundtrip_property(img):
    """Any gray image round-trips within ±1 count under the all-ones
    quant tables (DCT float rounding is the only loss source)."""
    out = C.decode_jpeg(C.encode_jpeg(img))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


@given(arrays(24), st.integers(0, 4))
@settings(max_examples=20, deadline=None)
def test_jpeg_rgb_roundtrip_property(gray, ri):
    img = np.stack([gray, np.roll(gray, 1, 0), np.roll(gray, 1, 1)], axis=2)
    out = C.decode_jpeg(C.encode_jpeg(img, restart_interval=ri))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3

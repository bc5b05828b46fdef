"""Property-based fuzz of the from-scratch baseline JPEG codec: arbitrary
dims (incl. non-multiples of 8), arbitrary pixel content, arbitrary restart
intervals — encode→decode must stay within the quantization error bound and
preserve dimensions. Complements the fixed-case tests in test_multimodal."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.ops.multimodal import encode_jpeg, parse_jpeg


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=41),
    w=st.integers(min_value=1, max_value=41),
    dri=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_property(h, w, dri, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w)) \
        .astype(np.float64)
    blob = encode_jpeg(img, quant=[1] * 64, restart_interval=dri)
    r = parse_jpeg(blob)
    assert (r["width"], r["height"]) == (w, h)
    out = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(h, w)
    # unit quant: error bounded by coefficient rounding
    assert np.abs(out.astype(np.float64) - img).max() <= 1.0


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    q=st.integers(min_value=1, max_value=8),
)
def test_jpeg_lossy_error_scales_with_quant(seed, q):
    """With quant table all-q the reconstruction error is bounded by the
    worst-case dequantization error summed over coefficients — loose bound
    64 * q/2 / 8 + 1 (IDCT spreads each coefficient's error by <= 1/8 in
    magnitude across pixels; +1 for pixel rounding)."""
    img = np.random.RandomState(seed).randint(0, 256, (16, 16)) \
        .astype(np.float64)
    r = parse_jpeg(encode_jpeg(img, quant=[q] * 64))
    out = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(16, 16)
    bound = 64 * (q / 2) / 8 + 1
    assert np.abs(out.astype(np.float64) - img).max() <= bound


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=37),
    w=st.integers(min_value=1, max_value=37),
    dri=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_color_roundtrip_property(h, w, dri, seed):
    """Color 4:2:0 fuzz over chroma-safe content (constant per 2x2 cell so
    subsampling is lossless): arbitrary dims incl. non-multiples of 16,
    arbitrary restart intervals — dims preserved, error within the
    integer-transform + unit-quant bound."""
    from crawl4ai_spark.ops.multimodal import encode_jpeg_color

    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (-(-h // 2), -(-w // 2), 3))
    img = np.repeat(np.repeat(base, 2, 0), 2, 1)[:h, :w, :]
    r = parse_jpeg(encode_jpeg_color(img, restart_interval=dri))
    assert (r["width"], r["height"], r["n_components"]) == (w, h, 3)
    out = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(h, w, 3)
    assert np.abs(out.astype(np.int64) - img).max() <= 5

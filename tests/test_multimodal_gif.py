"""GIF87a writer/parser (ops/multimodal.py): the repo writer emits a
degenerate clear-per-pixel stream (affine length for the oracle), so the
decoder's GENERALITY is proven here against an independent from-spec
greedy LZW compressor — variable code width, dictionary growth, KwKwK —
plus framing/corruption rejection. DuckDB parity runs in test_ops_parity."""

import pytest

from crawl4ai_spark.ops.multimodal import build_gif, parse_gif

SF = "/root/testdata/sf0.001"


def _lzw_compress(pixels: bytes, min_code: int) -> bytes:
    """Independent greedy GIF-LZW encoder (real dictionary growth — the
    opposite regime from the repo writer's clear-per-pixel stream)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes = []
    table = {bytes([c]): c for c in range(1 << min_code)}
    next_code = eoi + 1
    width = min_code + 1
    out_bits = []

    def emit(code):
        out_bits.append((code, width))

    emit(clear)
    prev = b""
    for px in pixels:
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        # mirror the decoder: it bumps width when len(table) reaches
        # 2^width AFTER appending the entry for the code it just read
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        prev = bytes([px])
    if prev:
        emit(table[prev])
    emit(eoi)
    acc = n_acc = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        data.append(acc & 0xFF)
    return bytes(data)


def _wrap_gif(pixels: bytes, w: int, h: int, pal: bytes,
              data: bytes, min_code: int = 2) -> bytes:
    out = bytearray()
    out += b"GIF87a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes((0xF1, 0, 0)) + pal
    out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") \
        + h.to_bytes(2, "little") + b"\x00"
    out.append(min_code)
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


PAL4 = bytes(range(12))


def test_decoder_handles_general_lzw_streams():
    """Repetitive pixel runs force real dictionary growth + width bumps;
    the decoder must reproduce them exactly."""
    cases = [
        bytes([0, 1, 2, 3] * 40),                 # periodic → deep strings
        bytes([0] * 97),                          # single-symbol (KwKwK)
        bytes((7 * j) % 4 for j in range(160)),   # mixed
        bytes([1, 1, 2, 1, 1, 2, 3] * 23),
    ]
    for pixels in cases:
        w, h = len(pixels), 1
        blob = _wrap_gif(pixels, w, h, PAL4, _lzw_compress(pixels, 2))
        r = parse_gif(blob)
        assert r["indices"] == pixels
        assert r["width"] == w and r["height"] == h


def test_decoder_kwkwk_case():
    """aaaa... is the canonical code==len(table) self-reference."""
    pixels = bytes([2] * 50)
    blob = _wrap_gif(pixels, 50, 1, PAL4, _lzw_compress(pixels, 2))
    assert parse_gif(blob)["indices"] == pixels


def test_decoder_skips_extension_blocks():
    pixels = bytes([0, 1, 2, 3] * 6)
    body = _wrap_gif(pixels, 24, 1, PAL4, _lzw_compress(pixels, 2))
    # splice a GCE extension (0x21 0xF9) between the tables and the image
    idx = body.index(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    blob = body[:idx] + ext + body[idx:]
    assert parse_gif(blob)["indices"] == pixels


def test_builder_stream_decodes_and_matches_arithmetic():
    for i in (0, 3, 17, 256, 4999):
        r = parse_gif(build_gif(i))
        w, h = 4 + i % 9, 3 + i % 5
        assert (r["width"], r["height"]) == (w, h)
        want = bytes((i + j) % 4 for j in range(w * h))
        assert r["indices"] == want
        pal = [((c * 85) % 256, (c * 60 + i) % 256, (c * 30 + 2 * i) % 256)
               for c in range(4)]
        assert r["pixel_sum"] == sum(sum(pal[p]) for p in want)


def test_corruption_rejected():
    blob = build_gif(7)
    with pytest.raises(ValueError):
        parse_gif(b"NOTAGIF" + blob[7:])
    with pytest.raises(ValueError):
        parse_gif(blob[:20])            # truncated before image block
    # pixel-count mismatch: claim a taller image than the stream holds
    bad = bytearray(blob)
    idx = blob.index(b"\x2c")
    bad[idx + 7] += 1                   # height low byte
    with pytest.raises(ValueError):
        parse_gif(bytes(bad))


def test_spark_query_roundtrip(spark):
    from crawl4ai_spark.ops.multimodal import q_multimodal_gif
    rows = q_multimodal_gif(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:20]:
        i = r.doc_id
        assert r.width == 4 + i % 9 and r.height == 3 + i % 5
        assert r.n_bytes == len(build_gif(i))


def test_sniff_detects_gif(spark):
    from crawl4ai_spark.ops.multimodal import sniff_mime
    rows = [(i, build_gif(i)) for i in range(6)]
    rows.append((99, build_gif(3)[:15]))        # truncated: no 0x3B trailer
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.mime, r.well_formed)
           for r in sniff_mime(df).collect()}
    for i in range(6):
        assert got[i] == ("image/gif", True)
    assert got[99] == ("image/gif", False)


def test_decoder_ignores_bytes_after_eoi():
    """The spec says data after EOI is ignored: a padded final sub-block
    must not be decoded as pixel codes."""
    pixels = bytes([0, 1, 2, 3] * 10)
    data = _lzw_compress(pixels, 2) + b"\x55\xaa"   # junk after EOI
    blob = _wrap_gif(pixels, 40, 1, PAL4, data)
    assert parse_gif(blob)["indices"] == pixels


def test_truncation_inside_subblocks_is_valueerror():
    """Truncation anywhere — including mid-sub-block — must surface as
    the documented ValueError, never IndexError."""
    blob = build_gif(7)
    for cut in (11, 20, 30, 38, len(blob) - 3):
        with pytest.raises(ValueError):
            parse_gif(blob[:cut])

"""mime_sniff (ops/multimodal.py): the construction-derived oracle in
test_ops_parity proves every real container sniffs to its true type; here
we drive the negative paths the synthesized corpus never produces —
truncated trailers, garbage, and magic-byte prefixes on junk bodies (the
sniffer is a PREFIX classifier by design: a 'BM' text file IS sniffed
image/bmp, exactly like the WHATWG table)."""

from pyspark.sql import functions as F

from crawl4ai_spark.ops.multimodal import (
    build_jpeg,
    build_png,
    build_wav,
    q_mime_sniff,
    sniff_mime,
)

SF = "/root/testdata/sf0.001"


def _sniff(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "id long, payload binary")
    return [(r.mime, r.well_formed)
            for r in sniff_mime(df).orderBy("id").collect()]


def test_sniff_negative_paths(spark):
    png, jpg, wav = build_png(7), build_jpeg(7), build_wav(7)
    got = _sniff(spark, [
        png[:-4],              # PNG with a chopped IEND trailer
        jpg[:-1],              # JPEG missing the EOI second byte
        b"\x00\x01\x02garbage",  # no magic at all
        b"BM" + b"not really a bitmap",  # prefix classifier: still bmp
        wav[:8] + b"LIST" + wav[12:],    # RIFF but not WAVE
        b"",                   # empty payload
    ])
    assert got[0] == ("image/png", False)
    assert got[1] == ("image/jpeg", False)
    assert got[2] == ("application/octet-stream", True)
    assert got[3] == ("image/bmp", True)
    assert got[4] == ("application/octet-stream", True)
    assert got[5] == ("application/octet-stream", True)


def test_sniff_real_corpus_all_well_formed(spark):
    bad = (q_mime_sniff(spark, SF)
           .filter(~F.col("well_formed")
                   | (F.col("mime") == "application/octet-stream"))
           .count())
    assert bad == 0

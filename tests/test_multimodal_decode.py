"""The real image codecs behind the multimodal pipeline
(multimodal.decode_image / encode_ppm): pure-numpy binary PPM (P6) and
24-bit BMP parsing, including the format corners a header+raw decoder
must get right (comments, row padding, scanline order)."""

import struct

import numpy as np
import pytest

from adscraper_spark.pipelines.multimodal import decode_image, encode_ppm


def _pixels(w, h, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    px = _pixels(16, 5)
    w, h, got = decode_image(encode_ppm(16, 5, px))
    assert (w, h) == (16, 5)
    assert np.array_equal(got, px)


def test_ppm_header_comments_and_whitespace():
    px = _pixels(3, 2)
    payload = (b"P6\n# a comment line\n  3\t2 # trailing\n255\n"
               + px.tobytes())
    w, h, got = decode_image(payload)
    assert (w, h) == (3, 2)
    assert np.array_equal(got, px)


def test_ppm_raster_may_start_with_whitespace_byte():
    """The single whitespace after maxval is consumed exactly once —
    a raster whose first pixel byte is 0x0A must survive."""
    px = _pixels(2, 2)
    px[0, 0, 0] = 0x0A
    w, h, got = decode_image(encode_ppm(2, 2, px))
    assert np.array_equal(got, px)


def test_ppm_16bit_rejected():
    with pytest.raises(ValueError):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def _bmp(px: np.ndarray, bottom_up: bool = True) -> bytes:
    """Hand-rolled 24-bit uncompressed BMP (BITMAPINFOHEADER)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = px[..., ::-1]  # RGB → BGR
    if bottom_up:
        rows = rows[::-1]
    body = b"".join(rows[r].tobytes().ljust(stride, b"\x00")
                    for r in range(h))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            h if bottom_up else -h,
                            1, 24, 0, len(body), 2835, 2835, 0, 0))
    return header + body


@pytest.mark.parametrize("bottom_up", [True, False])
@pytest.mark.parametrize("w", [4, 5])  # 5 → non-zero row padding
def test_bmp_decode(bottom_up, w):
    px = _pixels(w, 3)
    got_w, got_h, got = decode_image(_bmp(px, bottom_up))
    assert (got_w, got_h) == (w, 3)
    assert np.array_equal(got, px)


def test_bmp_8bit_rejected():
    px = _pixels(2, 2)
    bad = bytearray(_bmp(px))
    struct.pack_into("<H", bad, 28, 8)  # claim 8bpp
    with pytest.raises(ValueError):
        decode_image(bytes(bad))


def test_unknown_format_raises_without_pil():
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL available; fallback path takes over")
    except ImportError:
        pass
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\nnot-really")


def test_encode_ppm_validates_size():
    with pytest.raises(ValueError):
        encode_ppm(2, 2, b"\x00" * 5)


def test_corpus_image_payload_decodes_to_text_prefix(spark):
    """The pipeline's own payloads: a documents image row's PPM must
    decode to exactly the text prefix the DuckDB oracle reconstructs."""
    from adscraper_spark.pipelines.multimodal import (IMG_LINE, IMG_W,
                                                      _media_with_payload)

    SF = "/root/testdata/sf0.001"
    row = (_media_with_payload(spark, SF)
           .filter("media_type = 'image'").orderBy("doc_id").first())
    doc = (spark.read.parquet(f"{SF}/documents.parquet")
           .filter(f"doc_id = {row['doc_id']}").first())
    w, h, px = decode_image(bytes(row["payload"]))
    assert w == IMG_W
    assert h == len(doc["text"]) // IMG_LINE
    assert px.tobytes() == doc["text"].encode()[:IMG_LINE * h]

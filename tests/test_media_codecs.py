"""Pure-Python media codec tests (no SparkSession): BMP bottom-up + BGR +
stride padding, PPM header parse, WAV chunk walk + signed PCM16.  The
Spark-side decode operators are oracle-gated driver queries
(multimodal_bmp_decode / multimodal_wav_decode); these tests pin the
codec-level edge cases the synthetic corpus can't reach (negative
samples, non-multiple-of-4 strides, extra RIFF chunks)."""

import struct

import pytest

from fstore_sql_spark.operators.multimodal import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    sniff_decode_image,
)


def gradient(width: int, height: int) -> bytes:
    """Asymmetric raster: pixel (x,y) = (x, y, x+y) — distinguishes every
    row/column/channel mixup."""
    out = bytearray()
    for y in range(height):
        for x in range(width):
            out += bytes([x % 256, y % 256, (x + y) % 256])
    return bytes(out)


class TestBMP:
    def test_round_trip_padded_stride(self):
        # width 3 → row bytes 9 → stride 12: exercises padding
        rgb = gradient(3, 5)
        w, h, back = decode_bmp(encode_bmp(rgb, 3, 5))
        assert (w, h) == (3, 5)
        assert back == rgb

    def test_round_trip_aligned_stride(self):
        rgb = gradient(8, 4)
        assert decode_bmp(encode_bmp(rgb, 8, 4))[2] == rgb

    def test_file_is_genuinely_bottom_up_bgr(self):
        """The on-disk bytes must actually be BMP layout, not a naive
        echo: first raster pixel = bottom-left in BGR order."""
        rgb = gradient(3, 2)  # bottom-left pixel (x=0,y=1) = RGB(0,1,1)
        payload = encode_bmp(rgb, 3, 2)
        offset = struct.unpack_from("<I", payload, 10)[0]
        assert payload[offset : offset + 3] == bytes([1, 1, 0])  # BGR

    def test_rejects_non_bmp(self):
        with pytest.raises(ValueError):
            decode_bmp(b"NOTABMP")

    def test_rejects_compressed(self):
        payload = bytearray(encode_bmp(gradient(2, 2), 2, 2))
        struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError):
            decode_bmp(bytes(payload))


class TestPPM:
    def test_round_trip(self):
        rgb = gradient(7, 3)
        w, h, back = decode_ppm(encode_ppm(rgb, 7, 3))
        assert (w, h) == (7, 3)
        assert back == rgb

    def test_sniff_dispatch(self):
        rgb = gradient(2, 2)
        assert sniff_decode_image(encode_ppm(rgb, 2, 2))[2] == rgb
        assert sniff_decode_image(encode_bmp(rgb, 2, 2))[2] == rgb
        with pytest.raises(ValueError):
            sniff_decode_image(b"\x89PNG....")


class TestWAV:
    def test_round_trip_signed_samples(self):
        samples = [0, 1, -1, 32767, -32768, 12345, -12345]
        rate, channels, back = decode_wav(encode_wav(samples, 44100))
        assert rate == 44100
        assert channels == 1
        assert back == samples

    def test_chunk_walk_skips_extra_chunks(self):
        """Real WAVs often carry LIST/INFO chunks before data — the
        parser must walk, not assume fixed offsets."""
        samples = [5, -6, 7]
        payload = encode_wav(samples, 8000)
        # splice a LIST chunk between fmt and data
        fmt_end = 12 + 8 + 16
        extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
        spliced = payload[:fmt_end] + extra + payload[fmt_end:]
        rate, _, back = decode_wav(spliced)
        assert rate == 8000
        assert back == samples

    def test_odd_sized_chunk_word_alignment(self):
        samples = [9, 9]
        payload = encode_wav(samples, 8000)
        fmt_end = 12 + 8 + 16
        extra = struct.pack("<4sI", b"junk", 3) + b"abc\x00"  # padded to even
        spliced = payload[:fmt_end] + extra + payload[fmt_end:]
        assert decode_wav(spliced)[2] == samples

    def test_rejects_non_pcm(self):
        payload = bytearray(encode_wav([1, 2], 8000))
        struct.pack_into("<H", payload, 20, 3)  # IEEE float format tag
        with pytest.raises(ValueError):
            decode_wav(bytes(payload))

    def test_rejects_non_riff(self):
        with pytest.raises(ValueError):
            decode_wav(b"OggS" + b"\x00" * 40)

"""r5 hunt wave: randomized encode-decode round-trip properties and
torn-blob (truncation) fuzz for the own-built media codecs.

Complements the pointwise fixture tests in test_imaging/test_audio/
test_video: seeded random content, shapes and cut points; EVERY
truncation must fail loudly with ValueError/struct.error — never return
silently-short data and never escape the decode stages'
(ValueError, struct.error) fault barrier.  Pins the silent-corruption
class found and fixed this round: decode_wav returned fewer samples on
an even-length cut, decode_avi a short final frame, jpeg_decode
zero-padded pixels past the cut, png_decode raised zlib.error (not a
ValueError) or parsed a missing-IEND stream cleanly.
"""

import struct

import numpy as np
import pytest

from weaver_ray.functions.avicodec import decode_avi, encode_avi
from weaver_ray.functions.imaging import png_decode, png_encode, psnr
from weaver_ray.functions.jpegcodec import jpeg_decode, jpeg_encode
from weaver_ray.functions.wavcodec import decode_wav, encode_wav

LOUD = (ValueError, struct.error)


def test_wav_randomized_roundtrip_exact():
    rng = np.random.default_rng(42)
    for _ in range(25):
        n = int(rng.integers(0, 4000))
        pcm = rng.integers(-32768, 32768, n).astype(np.int16)
        if n:
            pcm[int(rng.integers(0, n))] = -32768  # dtype-boundary values
            pcm[int(rng.integers(0, n))] = 32767
        rate = int(rng.choice([8000, 16000, 44100]))
        r, out = decode_wav(encode_wav(pcm, rate))
        assert r == rate
        np.testing.assert_array_equal(out, pcm)


def test_wav_every_truncation_fails_loudly():
    """Exhaustive: every cut point of a WAV blob raises LOUD — before the
    r5 fix an even-length cut inside the data chunk silently decoded to
    FEWER samples."""
    blob = encode_wav(np.arange(-500, 500, dtype=np.int16))
    for cut in range(1, len(blob)):
        with pytest.raises(LOUD):
            decode_wav(blob[:cut])


def test_avi_randomized_roundtrip_and_truncation():
    rng = np.random.default_rng(7)
    for _ in range(5):
        nf = int(rng.integers(1, 5))
        w, h = int(rng.integers(8, 41)), int(rng.integers(8, 41))
        frames = [jpeg_encode(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                  for _ in range(nf)]
        blob = encode_avi(frames, w, h, fps=int(rng.integers(5, 30)))
        d = decode_avi(blob)
        assert (d["n_frames"], d["w"], d["h"]) == (nf, w, h)
        # MJPEG frames are stored verbatim: byte-equal passthrough
        assert all(a == b for a, b in zip(d["frames"], frames))
        for cut in rng.integers(1, len(blob), 40):
            with pytest.raises(LOUD):
                decode_avi(blob[:int(cut)])


def test_jpeg_randomized_roundtrip_and_truncation():
    rng = np.random.default_rng(3)
    for _ in range(5):
        h, w = int(rng.integers(8, 49)), int(rng.integers(8, 49))
        # low-frequency content + mild noise: JPEG's operating regime
        yy, xx = np.mgrid[0:h, 0:w]
        base = (96 + 60 * np.sin(xx / w * 3) + 60 * np.cos(yy / h * 2))
        img = np.clip(base[..., None] + rng.normal(0, 6, (h, w, 3)),
                      0, 255).astype(np.uint8)
        blob = jpeg_encode(img)
        assert blob == jpeg_encode(img)  # deterministic encoder
        out = jpeg_decode(blob)
        assert out.shape == img.shape
        assert psnr(img, out) >= 25.0
        for cut in rng.integers(2, len(blob), 60):
            with pytest.raises(LOUD):
                jpeg_decode(blob[:int(cut)])


def test_png_randomized_roundtrip_and_truncation():
    rng = np.random.default_rng(11)
    for _ in range(5):
        h, w = int(rng.integers(1, 49)), int(rng.integers(1, 49))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = png_encode(img)
        np.testing.assert_array_equal(png_decode(blob), img)  # lossless
        for cut in rng.integers(1, len(blob), 60):
            # the invariant is "never silently WRONG data": every cut
            # must raise LOUD, except one that only drops bytes of the
            # trailing IEND CRC — there the full image is still present
            # and must decode EXACTLY
            try:
                out = png_decode(blob[: int(cut)])
            except LOUD:
                continue
            assert int(cut) >= len(blob) - 4, cut
            np.testing.assert_array_equal(out, img)

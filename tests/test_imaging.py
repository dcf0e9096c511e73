"""PNG codec + phash + PSNR (the per-row invariant of BASELINE.json:15)."""

import numpy as np
import pytest

from weaver_ray.functions.imaging import (
    hamming64,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from weaver_ray.sources.corpus import gen_pixels, make_corpus_batch


def test_png_roundtrip_exact():
    for i in (0, 3, 57):
        px = gen_pixels(i)
        assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_roundtrip_random_shapes():
    rng = np.random.default_rng(0)
    for _ in range(5):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_corpus_row_invariant():
    t = make_corpus_batch(np.array([5, 10, 15]))
    for r in range(t.num_rows):
        fmt = t.column("fmt")[r].as_py()
        blob = t.column("bytes")[r].as_py()
        i = int(t.column("image_id")[r].as_py()[3:])
        ref = gen_pixels(i)
        if fmt == "png":
            got = png_decode(blob)
            assert np.array_equal(got, ref)          # lossless: exact
            assert psnr(got, ref) == float("inf")
        else:  # pragma: no cover - jpeg only with Pillow
            assert psnr(png_decode(blob), ref) >= 40.0
        assert t.column("phash")[r].as_py() == phash64(ref)
        assert t.column("w")[r].as_py() == ref.shape[1]
        assert t.column("h")[r].as_py() == ref.shape[0]


def test_phash_properties():
    px = gen_pixels(1)
    assert phash64(px) == phash64(px.copy())
    # small perturbation -> small hamming distance; different image -> larger
    noisy = px.copy()
    noisy[0, 0] = 255 - noisy[0, 0]
    a = np.array([phash64(px)], dtype=np.int64)
    assert hamming64(a, phash64(noisy))[0] <= 4
    assert hamming64(a, phash64(gen_pixels(999)))[0] > 4


def test_psnr_scale():
    px = gen_pixels(2).astype(np.float64)
    noisy = np.clip(px + np.random.default_rng(1).normal(0, 2.0, px.shape), 0, 255).astype(np.uint8)
    assert psnr(px.astype(np.uint8), noisy) >= 40.0

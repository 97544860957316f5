"""Baseline JPEG codec (ITU T.81 sequential DCT, pure numpy/stdlib):
exactness contract on tile-constant images, PSNR bounds on arbitrary
images, restart-marker resync, scope rejections, and the Spark operator
path through decode_image."""

from __future__ import annotations

import numpy as np
import pytest

from delm_spark.operators.image_codec import decode_image
from delm_spark.operators.jpeg_codec import (
    EXACT_QTABLE,
    decode_jpeg,
    encode_jpeg,
)


def _tile_image(rng, ty, tx, ch=1):
    tiles = rng.integers(0, 256, (ty, tx), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:, :, None]
    return np.repeat(img, ch, axis=2) if ch > 1 else img


def test_tile_constant_gray_roundtrip_exact():
    """Flat 8x8 tiles have AC==0 and integer DC divisible by the quant
    step, so encode->decode is bit-exact — the contract the oracle lane
    of image_pixel_stats_docs relies on."""
    rng = np.random.default_rng(3)
    img = _tile_image(rng, 4, 5)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_tile_constant_gray_as_rgb_roundtrip_exact():
    rng = np.random.default_rng(4)
    img = _tile_image(rng, 3, 4, ch=3)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


@pytest.mark.parametrize("ri", [1, 3, 5])
def test_restart_interval_roundtrip(ri):
    rng = np.random.default_rng(5)
    img = _tile_image(rng, 6, 7)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, restart_interval=ri)), img)


def test_smooth_color_psnr():
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    mse = ((out.astype(np.float64) - img) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 35


def test_noise_color_psnr_with_coarse_qtable():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (45, 67, 3), dtype=np.uint8)  # odd dims too
    out = decode_jpeg(encode_jpeg(img, qtable=np.clip(EXACT_QTABLE * 4, 1, 255)))
    assert out.shape == img.shape
    mse = ((out.astype(np.float64) - img) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 20


def test_decode_image_dispatch_and_scope_rejections():
    rng = np.random.default_rng(7)
    img = _tile_image(rng, 2, 2)
    data = encode_jpeg(img)
    assert np.array_equal(decode_image(data), img)
    # a baseline stream relabeled SOF2 is structurally invalid progressive
    # (its single scan has Se=63 in a DC band) — rejected, and dispatch
    # softens the rejection to None
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se == 0"):
        decode_jpeg(bytes(prog))
    assert decode_image(bytes(prog)) is None
    # arithmetic-coded SOF9 stays out of scope
    arith = bytearray(data)
    arith[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(bytes(arith))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")


# ---------------------------------------------------------------------------
# Progressive mode (T.81 Annex G)
# ---------------------------------------------------------------------------


def _roundtrip_equals_baseline(img, scans=None, qtable=None):
    """Entropy coding is lossless, so progressive decode must be
    bit-identical to baseline decode of the same image + qtable."""
    from delm_spark.operators.jpeg_codec import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(img, qtable=qtable))
    prog = decode_jpeg(encode_jpeg_progressive(img, qtable=qtable, scans=scans))
    return np.array_equal(base, prog)


@pytest.mark.parametrize("ch", [1, 3])
def test_progressive_default_script_matches_baseline(ch):
    rng = np.random.default_rng(21)
    for _ in range(4):
        h, w = int(rng.integers(8, 45)), int(rng.integers(8, 45))
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        assert _roundtrip_equals_baseline(img)


def test_progressive_spectral_selection_only():
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (33, 41, 1), dtype=np.uint8)
    scans = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)]
    assert _roundtrip_equals_baseline(img, scans=scans)


def test_progressive_deep_successive_approximation():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 40, 1), dtype=np.uint8)
    scans = [
        ([0], 0, 0, 0, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
        ([0], 1, 63, 0, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
    ]
    assert _roundtrip_equals_baseline(img, scans=scans)


def test_progressive_banded_color_with_refinement():
    rng = np.random.default_rng(24)
    scans = [([0, 1, 2], 0, 0, 0, 1), ([0, 1, 2], 0, 0, 1, 0)]
    for ci in range(3):
        scans += [([ci], 1, 5, 0, 1), ([ci], 6, 63, 0, 1)]
    for ci in range(3):
        scans += [([ci], 1, 5, 1, 0), ([ci], 6, 63, 1, 0)]
    img = rng.integers(0, 256, (24, 56, 3), dtype=np.uint8)
    assert _roundtrip_equals_baseline(img, scans=scans)


def test_progressive_eob_run_heavy_images():
    from delm_spark.operators.jpeg_codec import EXACT_QTABLE as Q

    # near-flat image: every band is EOB, exercising long EOB runs with
    # buffered correction bits
    img = np.full((80, 80, 1), 200, np.uint8)
    img[40, 40, 0] = 10
    assert _roundtrip_equals_baseline(img)
    rng = np.random.default_rng(25)
    img = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    assert _roundtrip_equals_baseline(img, qtable=np.clip(Q * 4, 1, 255))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))
    with pytest.raises(ValueError, match="qtable"):
        encode_jpeg(np.zeros((8, 8, 1), np.uint8), qtable=np.zeros(64, np.int64))

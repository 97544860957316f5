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
    # progressive SOF2 must raise (and dispatch must soften it to None)
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))
    assert decode_image(bytes(prog)) is None
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))
    with pytest.raises(ValueError, match="qtable"):
        encode_jpeg(np.zeros((8, 8, 1), np.uint8), qtable=np.zeros(64, np.int64))

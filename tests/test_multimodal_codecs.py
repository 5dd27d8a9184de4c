"""The real PPM/WAV codecs: byte-level roundtrips and corruption handling."""

import numpy as np
import pytest

from pdfplucker_spark.operators.multimodal import (
    _decode_ppm,
    _decode_wav,
    _encode_ppm,
    _encode_wav,
)


def test_ppm_roundtrip_exact():
    blob = _encode_ppm(5, 3, 7)
    assert blob.startswith(b"P6\n5 3\n255\n")
    w, h, r, g, b = _decode_ppm(blob)
    assert (w, h) == (5, 3)
    exp = [
        sum((x + y + 7 + ch) % 256 for x in range(5) for y in range(3))
        for ch in range(3)
    ]
    assert [r, g, b] == exp


def test_wav_roundtrip_exact():
    blob = _encode_wav(250, 16000, 123)
    rate, n, sum_abs = _decode_wav(blob)
    assert (rate, n) == (16000, 250)
    assert sum_abs == int(
        np.abs((np.arange(250) * 123) % 65536 - 32768).sum()
    )


def test_corrupt_inputs_raise():
    with pytest.raises(ValueError, match="P6"):
        _decode_ppm(b"JFIF....")
    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"OggS....")
    # truncated-but-valid-magic WAV: chunk layout check catches it
    with pytest.raises((ValueError, Exception)):
        _decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")

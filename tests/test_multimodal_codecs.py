"""The real PPM/WAV codecs: byte-level roundtrips and corruption handling."""

import numpy as np
import pytest

from pdfplucker_spark.operators.multimodal import (
    _decode_ppm,
    _decode_wav,
    _decode_y4m,
    _encode_ppm,
    _encode_wav,
    _encode_y4m,
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


def test_y4m_roundtrip_exact():
    w, h, nf, s = 6, 4, 3, 9
    blob = _encode_y4m(w, h, nf, s)
    assert blob.startswith(b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 C420jpeg\n")
    dw, dh, frames = _decode_y4m(blob)
    assert (dw, dh) == (w, h)
    assert len(frames) == nf
    for f, (sy, suv) in enumerate(frames):
        exp_y = sum((x + y + 7 * f + s) % 256 for x in range(w) for y in range(h))
        exp_uv = sum(
            (x + 2 * y + 11 * f + s + 1) % 256 + (x + 3 * y + 13 * f + s + 2) % 256
            for x in range(w // 2)
            for y in range(h // 2)
        )
        assert (sy, suv) == (exp_y, exp_uv), f


def test_binaryfile_ingestion_end_to_end(spark, tmp_path):
    """The production multimodal entry point: REAL files on disk →
    binaryFile source (glob-pruned) → magic-byte dispatch → the real
    codecs, errors as rows."""
    from pdfplucker_spark.operators.multimodal import media_decode_files
    from pdfplucker_spark.sources.connectors import read_media_files

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.ppm").write_bytes(_encode_ppm(5, 3, 7))
    (media / "b.wav").write_bytes(_encode_wav(250, 16000, 123))
    (media / "c.y4m").write_bytes(_encode_y4m(4, 4, 2, 1))
    (media / "d.bin").write_bytes(b"GARBAGE BYTES")
    (media / "skip.txt").write_text("not media")  # pruned by the glob

    files = read_media_files(spark, str(media), glob="*.{ppm,wav,y4m,bin}")
    got = {r.path.rsplit("/", 1)[1]: r for r in media_decode_files(files).collect()}
    assert set(got) == {"a.ppm", "b.wav", "c.y4m", "d.bin"}
    a, b, c, d = got["a.ppm"], got["b.wav"], got["c.y4m"], got["d.bin"]
    assert (a.media_kind, a.status, a.width, a.height) == ("image", "ok", 5, 3)
    assert a.payload_sum == sum(
        (x + y + 7 + ch) % 256 for x in range(5) for y in range(3) for ch in range(3)
    )
    assert (b.media_kind, b.status, b.n_samples) == ("audio", "ok", 250)
    assert b.payload_sum == int(np.abs((np.arange(250) * 123) % 65536 - 32768).sum())
    assert (c.media_kind, c.status, c.n_frames, c.width) == ("video", "ok", 2, 4)
    assert (d.media_kind, d.status) == (None, "error")


def test_y4m_corrupt_inputs_raise():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        _decode_y4m(b"RIFF....\nFRAME\n")
    good = _encode_y4m(4, 4, 2, 1)
    with pytest.raises(ValueError, match="truncated"):
        _decode_y4m(good[:-5])  # last frame payload cut short
    with pytest.raises(ValueError, match="FRAME"):
        _decode_y4m(good.replace(b"FRAME", b"FRAMX", 1))
    with pytest.raises(ValueError, match="chroma"):
        _decode_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\x00" * 48)


def test_media_dedup_key_is_byte_identity(spark):
    """The content key really is payload-byte identity: every multi-copy
    group's members encode to IDENTICAL bytes; items with different keys
    in the same modality encode to different bytes; canonical selection
    and copy counts match independent group arithmetic."""
    from collections import defaultdict

    from pdfplucker_spark.operators.multimodal import (
        _encode_by_kind,
        _media_params,
        q_media_dedup_exact,
    )

    sf = "/root/testdata/sf0.001"
    params = {}
    for r in _media_params(spark, sf).collect():
        if r.s % 23 == 0:
            continue
        if r.k == 0:
            key = f"0:{r.w},{r.h},{r.s}"
        elif r.k == 1:
            key = f"1:{r.n},{r.step},{r.rate}"
        else:
            key = f"2:{r.vw},{r.vh},{r.s},{r.nf}"
        params[(r.doc_id, r.media_ref)] = (key, r)

    groups = defaultdict(list)
    for (doc, ref), (key, r) in params.items():
        groups[key].append((doc, ref, r))

    def blob(r):
        return _encode_by_kind(
            r.k, r.w, r.h, r.s, r.n, r.step, r.rate, r.vw, r.vh, r.nf
        )

    multi = {k: v for k, v in groups.items() if len(v) > 1}
    assert multi, "corpus must contain duplicate media payloads"
    for key, members in list(multi.items())[:20]:
        blobs = {blob(r) for _, _, r in members}
        assert len(blobs) == 1, key
    # different key, same modality => different bytes
    by_mod = defaultdict(list)
    for key, members in groups.items():
        by_mod[key.split(":")[0]].append(members[0][2])
    for mod, rs in by_mod.items():
        if len(rs) >= 2:
            assert blob(rs[0]) != blob(rs[1]), mod

    got = {
        (r.doc_id, r.media_ref): r
        for r in q_media_dedup_exact(spark, sf).collect()
    }
    assert set(got) == set(params)
    for key, members in groups.items():
        ids = sorted((doc, ref) for doc, ref, _ in members)
        for j, (doc, ref) in enumerate(ids):
            r = got[(doc, ref)]
            assert r.content_key == key
            assert r.n_copies == len(ids)
            assert r.is_canonical == (j == 0)

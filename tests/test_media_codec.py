"""Pure-Python PNG codec + resize (multimodal vision preprocessing).

The decoder must handle all five PNG scanline filters even though our
own encoder only emits filter 0 — external corpora use them all."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vector_indexer_spark.operators.multimodal import (
    decode_png,
    encode_png,
    resize_array,
    resize_images,
)


def _filtered_png(arr: np.ndarray, ftype: int) -> bytes:
    """Reference-side PNG writer applying the SAME filter to every
    scanline (spec §9 reconstruction run in reverse) — exercises the
    decoder's unfiltering paths our encoder never produces."""
    h, w, channels = arr.shape
    bpp = channels
    a32 = arr.astype(np.int32)
    raw = bytearray()
    for y in range(h):
        line = a32[y].reshape(-1)
        up = a32[y - 1].reshape(-1) if y else np.zeros(w * bpp, np.int32)
        filt = bytearray([ftype])
        for x in range(w * bpp):
            a = line[x - bpp] if x >= bpp else 0
            b = up[x]
            c = up[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            filt.append((int(line[x]) - pred) & 0xFF)
        raw += filt

    def chunk(cid, data):
        return (
            struct.pack(">I", len(data)) + cid + data
            + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(channels):
    rng = np.random.default_rng(channels)
    x = rng.integers(0, 256, (11, 7, channels), dtype=np.uint8)
    assert (decode_png(encode_png(x)) == x).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decoder_unfilters_every_filter_type(ftype):
    rng = np.random.default_rng(ftype)
    x = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert (decode_png(_filtered_png(x, ftype)) == x).all()


def test_png_decoder_rejects_unsupported():
    x = np.zeros((4, 4, 3), dtype=np.uint8)
    b = bytearray(encode_png(x))
    # force palette color type in IHDR (byte 25) — CRC not checked
    b[25] = 3
    with pytest.raises(ValueError, match="color type"):
        decode_png(bytes(b))
    b = bytearray(encode_png(x))
    b[24] = 16  # bit depth
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(b))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a")


def test_resize_invariants():
    rng = np.random.default_rng(42)
    x = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    for method in ("nearest", "bilinear"):
        r = resize_array(x, 15, 10, method=method)
        assert r.shape == (10, 15, 3)
        u = resize_array(x, 60, 40, method=method)
        assert u.shape == (40, 60, 3)
    # constant image stays constant under both kernels
    const = np.full((8, 8, 1), 77, dtype=np.uint8)
    for method in ("nearest", "bilinear"):
        assert (resize_array(const, 5, 3, method=method) == 77).all()
    # identity resize is exact for nearest; bilinear with same grid too
    assert (resize_array(x, 30, 20, method="nearest") == x).all()
    assert (resize_array(x, 30, 20, method="bilinear") == x).all()
    with pytest.raises(ValueError, match="positive"):
        resize_array(x, 0, 5)
    with pytest.raises(ValueError, match="method"):
        resize_array(x, 5, 5, method="lanczos")


def test_resize_images_spark_matches_local(spark):
    rng = np.random.default_rng(7)
    imgs = {
        i: rng.integers(0, 256, (16 + i, 24 - i, 3), dtype=np.uint8)
        for i in range(4)
    }
    rows = [(i, "image", bytearray(encode_png(a)), "t") for i, a in imgs.items()]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, content binary, source string"
    )
    out = {
        r.media_id: r
        for r in resize_images(media, 8, 8, method="bilinear").collect()
    }
    assert set(out) == set(imgs)
    for i, arr in imgs.items():
        want = resize_array(arr, 8, 8, method="bilinear")
        got = decode_png(bytes(out[i].content))
        assert out[i].width == 8 and out[i].height == 8
        assert out[i].channels == 3
        assert (got == want).all()
    # raw-bytes mode for a downstream tensorizer
    raw = resize_images(media, 4, 4, reencode=False).collect()[0]
    assert len(bytes(raw.content)) == 4 * 4 * 3


def test_wav_roundtrip_and_rejects():
    from vector_indexer_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    for ch in (1, 2):
        x = rng.integers(-32768, 32768, (77, ch)).astype(np.int16)
        s, r = decode_wav(encode_wav(x, 44100))
        assert r == 44100 and (s == x).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    # float-format WAV (format code 3) rejected
    b = bytearray(encode_wav(np.zeros((4, 1), np.int16), 8000))
    b[20] = 3
    with pytest.raises(ValueError, match="16-bit PCM"):
        decode_wav(bytes(b))


def test_audio_features_zero_carry_zcr_and_stereo(spark):
    from vector_indexer_spark.operators.multimodal import (
        audio_features,
        encode_wav,
    )

    # zeros are transparent to ZCR: +,0,−,+ reduces to +,−,+ = 2 flips
    mono = np.array([5, 0, -5, 5], dtype=np.int16)[:, None]
    stereo = np.stack(
        [np.array([1, -1, 1, -1], np.int16),
         np.array([2, 2, 2, 2], np.int16)], axis=1
    )
    rows = [
        (0, "audio", bytearray(encode_wav(mono, 1000)), "t"),
        (1, "audio", bytearray(encode_wav(stereo, 2000)), "t"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, content binary, source string"
    )
    out = {r.media_id: r for r in audio_features(media).collect()}
    m = out[0]
    assert (m.n_frames, m.sample_rate, m.channels) == (4, 1000, 1)
    assert m.zero_crossings == 2  # + (0 skipped) - + : two sign flips
    assert m.sum_abs == 15 and m.peak_abs == 5 and m.sum_sq == 75
    assert m.duration_ms == 4 * 1000 // 1000
    s = out[1]
    assert (s.n_frames, s.channels) == (4, 2)
    assert s.zero_crossings == 3  # ch0: 3 flips, ch1: 0
    assert s.sum_abs == 4 + 8 and s.sum_sq == 4 + 16


def test_avi_demux_roundtrip_and_rejects():
    from vector_indexer_spark.operators.multimodal import (
        encode_avi,
        encode_png,
        parse_avi,
    )

    rng = np.random.default_rng(9)
    frames = [
        encode_png(rng.integers(0, 256, (6, 8, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    m = parse_avi(encode_avi(frames, 33333, 8, 6))
    assert m["n_frames"] == 4 and (m["width"], m["height"]) == (8, 6)
    assert m["duration_ms"] == 4 * 33333 // 1000
    assert m["frames"] == frames
    # odd-length frame payload exercises RIFF word alignment
    odd = [b"\x01\x02\x03", b"\x04"]
    m2 = parse_avi(encode_avi(odd, 1000, 1, 1))
    assert m2["frames"] == odd
    with pytest.raises(ValueError, match="not RIFF/AVI"):
        parse_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="avih"):
        parse_avi(b"RIFF\x04\x00\x00\x00AVI ")


def test_video_real_decode_and_frame_explode(spark):
    from vector_indexer_spark.operators.multimodal import (
        decode_png,
        demux_video_frames,
        encode_avi,
        encode_png,
        extract_features,
    )

    rng = np.random.default_rng(11)
    payloads = {}
    for vid, nf in ((0, 3), (1, 5)):
        payloads[vid] = [
            rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
            for _ in range(nf)
        ]
    rows = [
        (
            vid,
            "video",
            bytearray(
                encode_avi([encode_png(a) for a in arrs], 40000, 5, 4)
            ),
            "t",
        )
        for vid, arrs in payloads.items()
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, content binary, source string"
    )
    # the once-stubbed video branch of decoder="real" now works
    feats = {
        r.media_id: r
        for r in extract_features(media, decoder="real").collect()
    }
    assert (feats[0].width, feats[0].height) == (5, 4)
    assert feats[1].duration_ms == 5 * 40000 // 1000
    # per-frame explode → frames decode back to the exact pixels
    out = demux_video_frames(media).collect()
    assert {(r.media_id, r.frame_idx) for r in out} == {
        (v, i) for v, arrs in payloads.items() for i in range(len(arrs))
    }
    for r in out:
        assert (
            decode_png(bytes(r.frame)) == payloads[r.media_id][r.frame_idx]
        ).all()


def test_resize_images_composes_with_structured_streaming(spark, tmp_path):
    """The vision-preprocessing stage runs unchanged as a streaming
    transformation: mapInPandas is stream-capable, so readStream →
    resize_images → memory sink needs no special-casing — the shape
    of a continuous multimodal ingest pipeline."""
    from vector_indexer_spark.operators.multimodal import (
        decode_png,
        resize_array,
        resize_images,
    )

    rng = np.random.default_rng(21)
    imgs = {i: rng.integers(0, 256, (10, 12, 3), dtype=np.uint8) for i in range(6)}
    src = str(tmp_path / "media_src")
    spark.createDataFrame(
        [(i, bytearray(encode_png(a))) for i, a in imgs.items()],
        "media_id long, content binary",
    ).write.parquet(src)

    stream = spark.readStream.schema("media_id long, content binary").parquet(src)
    q = (
        resize_images(stream, 5, 4, method="nearest")
        .writeStream.format("memory")
        .queryName("t_media_resize")
        .option("checkpointLocation", str(tmp_path / "ckpt_media"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.media_id: r for r in spark.sql("SELECT * FROM t_media_resize").collect()
    }
    assert set(got) == set(imgs)
    for i, arr in imgs.items():
        want = resize_array(arr, 5, 4, method="nearest")
        assert (decode_png(bytes(got[i].content)) == want).all()


# ---------------------------------------------------------------------------
# Perceptual hashing + image near-dup
# ---------------------------------------------------------------------------


def test_ahash_invariants():
    from vector_indexer_spark.operators.multimodal import ahash_array

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    h = ahash_array(arr)
    # 56-bit non-negative long, deterministic
    assert 0 <= h < 1 << 56
    assert ahash_array(arr) == h
    # uniform brightness scaling preserves the threshold pattern
    assert ahash_array((arr // 2).astype(np.uint8)) == ahash_array(
        (arr // 2).astype(np.uint8)
    )
    # constant image: no pixel is strictly above the mean -> hash 0
    assert ahash_array(np.full((9, 9, 3), 77, np.uint8)) == 0
    # half-black / half-white: exactly the bright half's bits set
    hw = np.zeros((7, 8, 3), np.uint8)
    hw[:, 4:, :] = 255
    got = ahash_array(hw)
    want = sum(1 << (y * 8 + x) for y in range(7) for x in range(4, 8))
    assert got == want


def test_image_near_dups_banding_exact_and_capped(spark):
    from vector_indexer_spark.operators.multimodal import (
        ahash_array,
        decode_png,
        encode_png,
        image_ahash,
        image_near_dups,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (14, 16, 3), dtype=np.uint8)
    imgs = {}
    for i in range(12):
        a = base.copy()
        # flip a couple of pixels per image -> small hamming perturbations
        for _ in range(i % 4):
            y, x = rng.integers(0, 14), rng.integers(0, 16)
            a[y, x, :] = 255 - a[y, x, :]
        imgs[i] = a
    # plus one unrelated image far from the family
    imgs[99] = rng.integers(0, 256, (14, 16, 3), dtype=np.uint8)

    df = spark.createDataFrame(
        [(i, bytearray(encode_png(a))) for i, a in imgs.items()],
        "media_id long, content binary",
    )
    hashes = image_ahash(df)
    got_h = {r.media_id: r.ahash for r in hashes.collect()}
    for i, a in imgs.items():
        assert got_h[i] == ahash_array(decode_png(encode_png(a)))

    # banded join (max_hamming < bands) == brute-force all-pairs
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dups(hashes, max_hamming=3, bands=4).collect()
    }
    ids = sorted(imgs)
    want = {
        (a, b): bin(got_h[a] ^ got_h[b]).count("1")
        for ai, a in enumerate(ids)
        for b in ids[ai + 1:]
        if bin(got_h[a] ^ got_h[b]).count("1") <= 3
    }
    assert got == want

    # bucket cap: a degenerate all-identical bucket yields zero pairs
    same = spark.createDataFrame(
        [(i, 12345) for i in range(10)], "media_id long, ahash long"
    )
    capped = image_near_dups(same, max_hamming=3, bands=4, max_bucket_size=5)
    assert capped.count() == 0
    uncapped = image_near_dups(same, max_hamming=3, bands=4,
                               max_bucket_size=None)
    assert uncapped.count() == 45

    with pytest.raises(ValueError):
        image_near_dups(hashes, max_hamming=3, bands=5)
    with pytest.raises(ValueError):
        image_near_dups(hashes, max_hamming=-1)

"""Pure-numpy PPM/BMP codecs + the real decode/resize actor path."""

import json
import struct

import numpy as np
import pyarrow as pa
import pytest

from complexity_driven_feature_construction_ray.stages.multimodal import (
    ImageDecode,
    ImageResize,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
    resize_nearest,
    synthetic_ppm_table,
)


def _bmp_bytes(img_rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-build an uncompressed 24-bpp BMP (the golden the decoder is
    tested against — independent of the decoder's own parsing)."""
    h, w, _ = img_rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        row = img_rgb[r, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel_data = b"".join(rows)
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (h if not top_down else -h), 1, 24, 0,
        len(pixel_data), 2835, 2835, 0, 0,
    )
    return header + info + pixel_data


@pytest.fixture
def img():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)


class TestCodecs:
    def test_ppm_roundtrip(self, img):
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_ppm_header_comments(self, img):
        payload = encode_ppm(img)
        # inject a comment line after the magic, per netpbm spec
        with_comment = b"P6\n# a comment\n" + payload[3:]
        assert np.array_equal(decode_ppm(with_comment), img)

    def test_ppm_rejects_non_p6(self):
        with pytest.raises(ValueError):
            decode_ppm(b"P3\n1 1\n255\n000")

    def test_bmp_bottom_up(self, img):
        assert np.array_equal(decode_bmp(_bmp_bytes(img)), img)

    def test_bmp_top_down(self, img):
        assert np.array_equal(decode_bmp(_bmp_bytes(img, top_down=True)), img)

    def test_bmp_row_padding(self):
        # w=3 -> 9 bytes/row, padded to 12: padding must be dropped
        img = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
        assert np.array_equal(decode_bmp(_bmp_bytes(img)), img)

    def test_dispatch_and_stub(self, img):
        assert np.array_equal(decode_image(encode_ppm(img)), img)
        assert np.array_equal(decode_image(_bmp_bytes(img)), img)
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n\x1a\n....", "image/png")

    def test_resize_nearest_golden(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
        small = resize_nearest(img, 0.5)
        # nearest with scale 0.5 picks rows/cols 0 and 2
        assert np.array_equal(small[:, :, 0], np.array([[0, 2], [8, 10]]))
        big = resize_nearest(small, 2.0)
        assert big.shape == (4, 4, 1)


class TestRealActorPath:
    def test_decode_features_match_numpy_oracle(self, img):
        import pyarrow as pa

        t = pa.table(
            {
                "item_id": ["a"],
                "payload": [encode_ppm(img)],
                "media_type": ["image/x-portable-pixmap"],
                "meta": [json.dumps({"w": 7, "h": 5})],
            }
        )
        out = ImageDecode(fake=False)(t)
        luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]).astype(np.uint8)
        expect = np.bincount(luma.reshape(-1) >> 4, minlength=16)[:16] / luma.size
        got = np.array(out["features"].to_pylist()[0])
        assert np.allclose(got, expect, atol=1e-6)

    def test_resize_real_updates_dims_and_reencodes(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(synthetic_ppm_table(16, w=32, h=24))
        out = ds.map_batches(
            ImageResize, fn_constructor_kwargs={"scale": 0.5, "fake": False},
            batch_format="pyarrow", batch_size=8, concurrency=2,
        ).to_pandas()
        assert len(out) == 16
        for payload, meta in zip(out["payload"], out["meta"]):
            m = json.loads(meta)
            assert (m["w"], m["h"]) == (16, 12)
            dec = decode_ppm(bytes(payload))
            assert dec.shape == (12, 16, 3)

    def test_resize_then_decode_matches_driver_side(self, ray_session):
        """The distributed resize->decode equals the same numpy ops run
        driver-side on the same payloads (allclose parity)."""
        import ray.data

        t = synthetic_ppm_table(8, w=16, h=16)
        ds = ray.data.from_arrow(t)
        out = (
            ds.map_batches(
                ImageResize, fn_constructor_kwargs={"scale": 0.5, "fake": False},
                batch_format="pyarrow", batch_size=4, concurrency=2,
            )
            .map_batches(
                ImageDecode, fn_constructor_args=(False,),
                batch_format="pyarrow", batch_size=4, concurrency=2,
            )
            .to_pandas()
            .sort_values("item_id")
        )
        for payload, feats in zip(t["payload"].to_pylist(), out["features"]):
            img = resize_nearest(decode_ppm(payload), 0.5)
            luma = (
                0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
            ).astype(np.uint8)
            expect = np.bincount(luma.reshape(-1) >> 4, minlength=16)[:16] / luma.size
            assert np.allclose(np.array(feats), expect, atol=1e-6)


class TestWavCodec:
    def test_roundtrip_mono_and_stereo(self):
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_wav,
            encode_wav,
        )

        x = (np.sin(np.linspace(0, 40, 3000)) * 15000).astype(np.int16)
        y, sr = decode_wav(encode_wav(x, 16000))
        assert sr == 16000 and np.array_equal(x, y)
        st = np.stack([x, -x], axis=1)
        y2, sr2 = decode_wav(encode_wav(st, 8000))
        assert sr2 == 8000 and np.array_equal(st, y2)

    def test_sine_rms_golden(self):
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            AudioDecode,
            encode_wav,
        )

        sr, amp = 8000, 0.5
        t = np.arange(sr) / sr
        pcm = (amp * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
        batch = pa.table(
            {
                "item_id": pa.array(["a"]),
                "payload": pa.array([encode_wav(pcm, sr)], type=pa.binary()),
            }
        )
        out = AudioDecode(n_frames=4)(batch)
        assert abs(out["duration_s"][0].as_py() - 1.0) < 1e-9
        assert abs(out["rms"][0].as_py() - amp / np.sqrt(2)) < 1e-3
        assert len(out["frame_rms"][0].as_py()) == 4

    def test_non_riff_and_nonpcm_are_declared_stubs(self):
        import struct

        from complexity_driven_feature_construction_ray.stages.multimodal import decode_wav

        with pytest.raises(NotImplementedError):
            decode_wav(b"\x89PNG not audio at all........")
        # a float-format (3) WAV: stub, not silent garbage
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        payload = b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8) + b"WAVE" + fmt + b"data" + struct.pack("<I", 0)
        with pytest.raises(NotImplementedError):
            decode_wav(payload)

    def test_query_runs_deterministically(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import m_decode_wav

        a = m_decode_wav("/root/testdata/sf0.001").to_pandas().sort_values("item_id")
        b = m_decode_wav("/root/testdata/sf0.001").to_pandas().sort_values("item_id")
        assert len(a) == 64
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


class TestY4M:
    def test_roundtrip_and_chroma_skip(self):
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_y4m,
            encode_y4m,
        )

        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (5, 8, 10), dtype=np.uint8)
        dec, fps = decode_y4m(encode_y4m(frames, fps=30))
        assert fps == 30
        np.testing.assert_array_equal(dec, frames)

    def test_rejects_non_y4m(self):
        import pytest

        from complexity_driven_feature_construction_ray.stages.multimodal import decode_y4m

        with pytest.raises(ValueError):
            decode_y4m(b"RIFF....not a y4m stream")

    def test_frame_sample_luma_golden(self, ray_session):
        # the synthetic clip's sampled-frame luma mean is analytic:
        # base gray + bright-square lift (64 px of 235 over w*h)
        import ray.data

        from complexity_driven_feature_construction_ray.stages.multimodal import (
            VideoFrameSample,
            decode_y4m,
            synthetic_y4m_table,
        )

        t = synthetic_y4m_table(6, w=32, h=24, n_frames=12)
        out = (
            ray.data.from_arrow(t)
            .map_batches(VideoFrameSample, fn_constructor_kwargs={"stride": 4},
                         batch_format="pyarrow", concurrency=1)
            .to_pandas().sort_values("media_id")
        )
        assert (out["n_frames"] == 12).all() and (out["n_sampled"] == 3).all()
        assert (out["fps"] == 25).all()
        for mid, means in zip(out["media_id"], out["frame_luma_mean"]):
            frames, _ = decode_y4m(t["payload"][mid].as_py())
            for k, m in enumerate(means):
                np.testing.assert_allclose(m, frames[::4][k].mean(), atol=1e-6)


class TestPNGCodec:
    def test_roundtrip_rgb_gray_rgba(self):
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_image,
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(5)
        for c in (1, 3, 4):
            img = rng.integers(0, 256, (11, 7, c), dtype=np.uint8)
            back = decode_png(encode_png(img))
            np.testing.assert_array_equal(back, img)
        # dispatch: gray expands to RGB, alpha drops
        g = rng.integers(0, 256, (5, 4, 1), dtype=np.uint8)
        out = decode_image(encode_png(g))
        assert out.shape == (5, 4, 3)
        np.testing.assert_array_equal(out[:, :, 0], g[:, :, 0])
        a = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
        out = decode_image(encode_png(a))
        np.testing.assert_array_equal(out, a[:, :, :3])

    def test_all_five_filters_reconstruct(self):
        """Encode each row with an explicit filter type (the spec's
        filter math applied forward), decode, expect the original."""
        import struct
        import zlib

        from complexity_driven_feature_construction_ray.stages.multimodal import (
            _PNG_SIG,
            decode_png,
        )

        rng = np.random.default_rng(9)
        h, w, c = 10, 6, 3
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        flat = img.reshape(h, w * c).astype(np.int64)
        bpp = c
        scan = bytearray()
        for y in range(h):
            f = y % 5
            row = flat[y]
            prev = flat[y - 1] if y else np.zeros(w * c, dtype=np.int64)
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
            if f == 0:
                filt = row
            elif f == 1:
                filt = row - left
            elif f == 2:
                filt = row - prev
            elif f == 3:
                filt = row - ((left + prev) >> 1)
            else:  # Paeth
                p = left + prev - upleft
                pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
                )
                filt = row - pred
            scan.append(f)
            scan.extend((filt & 0xFF).astype(np.uint8).tobytes())

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        payload = (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(scan)))
            + chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(decode_png(payload), img)

    def test_interlaced_rejected(self):
        import struct
        import zlib

        from complexity_driven_feature_construction_ray.stages.multimodal import (
            _PNG_SIG,
            decode_png,
        )

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        payload = (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            decode_png(payload)


class TestAudioSpectral:
    def test_pure_sine_centroid_matches_frequency(self):
        """A pure sine's magnitude spectrum concentrates at its
        frequency, so centroid and rolloff both pin to ~f0."""
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            AudioSpectral,
            encode_wav,
        )

        sr, f0, n = 8000, 1000.0, 4096
        t = np.arange(n) / sr
        x = (0.5 * np.sin(2 * np.pi * f0 * t) * 32767).astype(np.int16)
        batch = pa.table(
            {
                "item_id": ["sine"],
                "payload": pa.array([encode_wav(x, sr)], type=pa.binary()),
            }
        )
        out = AudioSpectral(frame=512)(batch)
        c = out["centroid_hz"][0].as_py()
        r = out["rolloff_hz"][0].as_py()
        assert abs(c - f0) < 60.0, c  # Hann leakage keeps it within a bin or two
        assert abs(r - f0) < 60.0, r
        assert len(out["band_log_energy"][0].as_py()) == 4

    def test_batched_fft_matches_single_item(self):
        """Two items in one batch give the same features as each alone
        (the owner-indexed batched FFT does not mix items)."""
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            AudioSpectral,
            encode_wav,
        )

        rng = np.random.default_rng(3)
        sr = 8000
        xs = [
            (0.4 * np.sin(2 * np.pi * 500.0 * np.arange(3000) / sr) * 32767).astype(np.int16),
            (rng.normal(0, 0.2, 2500) * 32767).clip(-32768, 32767).astype(np.int16),
        ]
        pl = [encode_wav(x, sr) for x in xs]
        both = AudioSpectral(frame=512)(
            pa.table({"item_id": ["a", "b"], "payload": pa.array(pl, type=pa.binary())})
        )
        for i, name in enumerate(["a", "b"]):
            solo = AudioSpectral(frame=512)(
                pa.table({"item_id": [name], "payload": pa.array([pl[i]], type=pa.binary())})
            )
            assert abs(both["centroid_hz"][i].as_py() - solo["centroid_hz"][0].as_py()) < 1e-9
            assert abs(both["rolloff_hz"][i].as_py() - solo["rolloff_hz"][0].as_py()) < 1e-9


class TestPHashDedup:
    def test_planted_near_dups_cluster_cross_format(self, ray_session):
        """A noise-perturbed PNG re-encode of a PPM image must land in
        the same cluster; unrelated images must not pair."""
        import ray.data

        from complexity_driven_feature_construction_ray.stages.dedup import phash_dedup
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_image,
            encode_png,
            synthetic_ppm_table,
        )

        n = 32
        base = synthetic_ppm_table(n)
        rng = np.random.default_rng(11)
        ids = list(base["item_id"].to_pylist())
        payloads = list(base["payload"].to_pylist())
        planted = []
        for i in range(0, n, 8):
            img = decode_image(payloads[i]).astype(np.int64)
            noisy = np.clip(img + rng.integers(-1, 2, img.shape), 0, 255).astype(np.uint8)
            ids.append(f"dup-{ids[i]}")
            payloads.append(encode_png(noisy))
            planted.append((ids[i], f"dup-{ids[i]}"))
        ds = ray.data.from_arrow(
            pa.table({"item_id": ids, "payload": pa.array(payloads, type=pa.binary())})
        ).repartition(5)
        out = phash_dedup(ds, payload_col="payload", id_col="item_id", max_hamming=6)
        rep = dict(zip(out["id"], out["rep_id"]))
        for a, b in planted:
            assert rep.get(a, a) == rep.get(b, b), (a, b)
        # the synthetic gradient pattern differs mainly by the blue
        # plane; ensure at least the planted pairs drive the clusters
        # and the cluster map stays small (no everything-matches blowup)
        assert len(out) <= 4 * len(planted)


class TestJpegCodec:
    """Baseline JPEG (stages/jpeg.py). The round-trip tests are backed
    by an INDEPENDENT naive float DCT/quantize/dequantize/IDCT oracle
    written here with double loops — it shares no code with the codec,
    so a zigzag/huffman/table inconsistency in the implementation
    cannot cancel itself out in the comparison."""

    @staticmethod
    def _naive_dct_roundtrip(plane, q):
        """Per-8x8-block: DCT-II -> quantize -> dequantize -> IDCT,
        written as explicit double loops (the test's own math)."""
        import math

        h, w = plane.shape
        out = np.zeros((h, w))
        for by in range(0, h, 8):
            for bx in range(0, w, 8):
                blk = plane[by:by + 8, bx:bx + 8] - 128.0
                coef = np.zeros((8, 8))
                for u in range(8):
                    for v in range(8):
                        s = 0.0
                        for y in range(8):
                            for x in range(8):
                                s += (blk[y, x]
                                      * math.cos((2 * y + 1) * u * math.pi / 16)
                                      * math.cos((2 * x + 1) * v * math.pi / 16))
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        coef[u, v] = 0.25 * cu * cv * s
                coef = np.round(coef / q) * q
                rec = np.zeros((8, 8))
                for y in range(8):
                    for x in range(8):
                        s = 0.0
                        for u in range(8):
                            for v in range(8):
                                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                                s += (cu * cv * coef[u, v]
                                      * math.cos((2 * y + 1) * u * math.pi / 16)
                                      * math.cos((2 * x + 1) * v * math.pi / 16))
                        rec[y, x] = 0.25 * s + 128.0
                out[by:by + 8, bx:bx + 8] = rec
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def test_gray_matches_independent_dct_oracle(self):
        """Grayscale 16x16 at quality 50: decode(encode(img)) must equal
        the naive-loop DCT round trip EXACTLY (same quant table, exact
        integer coefficient stream in between — any huffman / zigzag /
        dequant slip shows as a pixel diff)."""
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            _QBASE_L,
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(5)
        img = np.clip(
            np.linspace(40, 215, 16)[None, :]
            + np.linspace(0, 30, 16)[:, None]
            + rng.integers(-20, 21, (16, 16)),
            0, 255,
        ).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=50))[:, :, 0]
        want = self._naive_dct_roundtrip(
            img.astype(np.float64), _QBASE_L.reshape(8, 8).astype(np.float64)
        )
        np.testing.assert_array_equal(got, want)

    def test_flat_field_is_exact(self):
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        for v in (0, 128, 200, 255):
            img = np.full((24, 16, 3), v, np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=50))
            assert int(np.abs(out.astype(int) - v).max()) <= 1, v

    def test_color_roundtrip_444_and_420(self):
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(7)
        yy, xx = np.mgrid[0:41, 0:67]
        img = np.stack(
            [np.clip(40 + xx * 2.0, 0, 255),
             np.clip(20 + yy * 3.0, 0, 255),
             np.clip(60 + xx + yy, 0, 255)], axis=2
        )
        img = np.clip(img + rng.integers(-4, 5, img.shape), 0, 255).astype(np.uint8)
        for sub, tol in (("444", 3.0), ("420", 4.0)):
            payload = encode_jpeg(img, quality=90, subsample=sub)
            out = decode_jpeg(payload)
            assert out.shape == img.shape
            err = np.abs(out.astype(np.int64) - img.astype(np.int64))
            assert err.mean() < tol, (sub, err.mean())

    def test_non_multiple_of_mcu_dims(self):
        """Odd sizes force edge padding + crop on both paths."""
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        for h, w in ((9, 13), (17, 8), (8, 8), (23, 31)):
            img = np.clip(
                np.linspace(0, 255, w)[None, :, None]
                + np.zeros((h, w, 3)), 0, 255
            ).astype(np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=92, subsample="420"))
            assert out.shape == (h, w, 3)
            assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0

    def test_progressive_and_garbage_are_declared(self):
        import pytest as _pytest

        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.full((8, 8), 99, np.uint8)
        payload = bytearray(encode_jpeg(img))
        # flip SOF0 (FFC0) to SOF9 (FFC9, arithmetic): declared
        # NotImplementedError (SOF2 is now a REAL tier — see
        # TestProgressiveJpeg)
        i = payload.find(b"\xff\xc0")
        payload[i + 1] = 0xC9
        with _pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))
        # a baseline scan mislabeled SOF2 is malformed (Ss=0, Se=63
        # is not a legal progressive scan): loud ValueError
        payload[i + 1] = 0xC2
        with _pytest.raises(ValueError):
            decode_jpeg(bytes(payload))
        with _pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01\x02")

    def test_dispatch_via_decode_image(self):
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_image,
        )
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            encode_jpeg,
        )

        img = np.full((16, 16, 3), 77, np.uint8)
        out = decode_image(encode_jpeg(img, quality=75), "image/jpeg")
        assert out.shape == (16, 16, 3)
        assert np.abs(out.astype(int) - 77).max() <= 1

    def test_query_runs_deterministically(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import (
            m_decode_jpeg,
        )

        a = m_decode_jpeg("/root/testdata/sf0.001").to_pandas() \
            .sort_values("item_id").reset_index(drop=True)
        b = m_decode_jpeg("/root/testdata/sf0.001").to_pandas() \
            .sort_values("item_id").reset_index(drop=True)
        assert len(a) == 64
        assert set(a["subsample"]) == {"444", "420"}
        assert (a["feat_dim"] == 16).all()
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)


class TestMjpegAvi:
    def test_container_roundtrip(self):
        from complexity_driven_feature_construction_ray.stages.jpeg import decode_jpeg
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        rng = np.random.default_rng(11)
        # smooth frames (JPEG-friendly): per-frame constant + mild ramp
        base = rng.integers(40, 200, 5)
        ramp = np.tile(np.arange(16, dtype=np.uint8) // 4, (16, 1))
        frames = np.stack([(np.full((16, 16), b, np.uint8) + ramp) for b in base])
        avi = encode_avi_mjpeg(frames, fps=30, quality=95)
        jpegs, fps, w, h = decode_avi_mjpeg(avi)
        assert (len(jpegs), fps, w, h) == (5, 30, 16, 16)
        for k, j in enumerate(jpegs):
            img = decode_jpeg(j)
            img = img[:, :, 0] if img.ndim == 3 else img
            assert np.abs(img.astype(int) - frames[k].astype(int)).max() <= 2

    def test_rejects_non_avi(self):
        import pytest

        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_avi_mjpeg,
        )

        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"YUV4MPEG2 W8 H8\nFRAME\n")
        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")

    def test_frame_sample_golden_vs_source(self, ray_session):
        # sampled-frame luma means must match the SOURCE frames within
        # baseline-JPEG quantization loss; stride semantics match Y4M
        import ray.data

        from complexity_driven_feature_construction_ray.stages.multimodal import (
            VideoFrameSample,
            synthetic_mjpeg_table,
        )

        t = synthetic_mjpeg_table(6, w=32, h=24, n_frames=8)
        out = (
            ray.data.from_arrow(t)
            .map_batches(VideoFrameSample, fn_constructor_kwargs={"stride": 4},
                         batch_format="pyarrow", concurrency=1)
            .to_pandas().sort_values("media_id").reset_index(drop=True)
        )
        assert (out["n_frames"] == 8).all() and (out["n_sampled"] == 2).all()
        assert (out["fps"] == 25).all()
        assert (out["width"] == 32).all() and (out["height"] == 24).all()
        # analytic source mean: base gray + (235-base) * 64px / (32*24)
        rng = np.random.default_rng(45)
        for mid, means in zip(out["media_id"], out["frame_luma_mean"]):
            base = int(rng.integers(20, 120))
            want = base + (235 - base) * 64.0 / (32 * 24)
            for m in means:
                assert abs(m - want) < 1.5, (mid, m, want)

    def test_query_runs_deterministically(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import (
            m_decode_mjpeg,
        )

        a = m_decode_mjpeg("/root/testdata/sf0.001")
        b = m_decode_mjpeg("/root/testdata/sf0.001")
        assert len(a) == 32
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)


class TestProgressiveJpeg:
    """Progressive (SOF2) tier of stages/jpeg.py. Two independent
    checks: (1) a HAND-BUILT golden progressive stream (DQT/SOF2/DHT
    and every entropy bit written by the test itself from T.81) must
    decode to the naive-loop IDCT of the hand-picked coefficients —
    this verifies the decoder with no code shared with the encoder, so
    a paired encoder/decoder bug cannot cancel out; (2) progressive
    encode→decode must equal BASELINE encode→decode pixel-for-pixel on
    the same input/quality, because progressive only reorders the same
    coefficient stream."""

    @staticmethod
    def _naive_idct_plus128(coef_natural):
        import math

        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv * coef_natural[u, v]
                              * math.cos((2 * y + 1) * u * math.pi / 16)
                              * math.cos((2 * x + 1) * v * math.pi / 16))
                out[y, x] = 0.25 * s + 128.0
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def test_golden_handbuilt_progressive_stream(self):
        """8×8 gray, identity quant table, coefficients DC=6 and
        zigzag[1]=5, delivered over THREE scans (DC first Al=1, DC
        refinement Al=0, AC first Ss=1..63): every byte below is
        derived by hand from T.81 — canonical one/two-symbol huffman
        tables, magnitude bits, EOB — and written literally."""
        from complexity_driven_feature_construction_ray.stages.jpeg import decode_jpeg

        out = bytearray(b"\xff\xd8")
        # DQT: table 0, all ones (identity dequant)
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
        # SOF2: 8-bit, 8x8, 1 component (id 1, h=v=1, tq 0)
        out += b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
        out += (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + b"\x01"
        out += bytes([1, 0x11, 0])
        # --- scan 1: DC first, Ah=0 Al=1. value = 6>>1 = 3, diff=3,
        # size 2, bits '11'. DHT class0/slot0: one code of length 1
        # ('0') for symbol 2.
        out += b"\xff\xc4" + (20).to_bytes(2, "big") + b"\x00"
        out += bytes([1] + [0] * 15) + bytes([2])
        out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
        out += bytes([1, 0x00]) + bytes([0, 0, 0x01])
        # bits: '0' (huffman sym 2) + '11' (magnitude 3) + pad '11111'
        out += bytes([0b01111111])
        # --- scan 2: DC refinement, Ah=1 Al=0. bit = 6 & 1 = 0.
        out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
        out += bytes([1, 0x00]) + bytes([0, 0, 0x10])
        out += bytes([0b01111111])  # '0' + pad
        # --- scan 3: AC first, Ss=1 Se=63 Ah=0 Al=0. zigzag k=1 is 5:
        # (run 0, size 3, bits '101'), then EOB (sym 0x00). DHT
        # class1/slot0: canonical codes '0'->0x03, '10'->0x00.
        out += b"\xff\xc4" + (21).to_bytes(2, "big") + b"\x10"
        out += bytes([1, 1] + [0] * 14) + bytes([0x03, 0x00])
        out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
        out += bytes([1, 0x00]) + bytes([1, 63, 0x00])
        # bits: '0' (rs=0x03) + '101' (mag 5) + '10' (EOB) + pad '11'
        out += bytes([0b01011011])
        out += b"\xff\xd9"

        got = decode_jpeg(bytes(out))[:, :, 0]
        coef = np.zeros((8, 8))
        coef[0, 0] = 6.0  # DC
        coef[0, 1] = 5.0  # zigzag position 1 = natural (0, 1)
        want = self._naive_idct_plus128(coef)
        assert np.array_equal(got, want)

    def test_progressive_equals_baseline_gray(self):
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(42)
        for shape in [(8, 8), (16, 16), (24, 17), (33, 29)]:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            for q in (35, 50, 90):
                base = decode_jpeg(encode_jpeg(img, quality=q))
                prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
                assert np.array_equal(base, prog), (shape, q)

    def test_progressive_equals_baseline_rgb_444_420(self):
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(7)
        for shape in [(16, 16, 3), (24, 17, 3), (34, 30, 3), (19, 21, 3)]:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            for q in (50, 90):
                for sub in ("444", "420"):
                    base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
                    prog = decode_jpeg(
                        encode_jpeg_progressive(img, quality=q, subsample=sub))
                    assert np.array_equal(base, prog), (shape, q, sub)

    def test_progressive_smooth_content_eob_runs(self):
        """Smooth gradients quantize to long zero runs — the content
        class that exercises EOB-run coding across many blocks."""
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        y, x = np.mgrid[0:40, 0:48]
        img = np.stack([(x * 5) % 256, (y * 3) % 256,
                        ((x + y) * 2) % 256], axis=2).astype(np.uint8)
        for q in (30, 75, 95):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(base, prog), q
        flat = np.full((32, 32), 200, np.uint8)  # all-EOB corner case
        assert np.array_equal(
            decode_jpeg(encode_jpeg(flat, quality=80)),
            decode_jpeg(encode_jpeg_progressive(flat, quality=80)))

    def test_sof2_marker_present_and_arith_still_stubbed(self):
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        payload = encode_jpeg_progressive(
            np.zeros((8, 8), np.uint8), quality=80)
        assert b"\xff\xc2" in payload  # SOF2
        # arithmetic-coded SOF9 remains a declared stub
        bad = bytearray(payload)
        i = bad.index(b"\xff\xc2")
        bad[i + 1] = 0xC9
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(bad))

    def test_decode_media_dispatches_progressive(self):
        """The multimodal dispatch path feeds progressive payloads to
        the same decoder (JPEG sniffing is container-level)."""
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )
        from complexity_driven_feature_construction_ray.stages.multimodal import (
            decode_image,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        payload = encode_jpeg_progressive(img, quality=85)
        got = decode_image(payload, "image/jpeg")
        assert np.array_equal(got, decode_jpeg(payload))

    def test_progressive_query_matches_baseline_query(self, ray_session):
        """m_decode_jpeg_progressive must produce the EXACT same
        feature table as m_decode_jpeg: the payloads carry the same
        coefficients, only the scan order differs."""
        import pandas as pd

        from complexity_driven_feature_construction_ray.pipelines.relational import (
            m_decode_jpeg,
            m_decode_jpeg_progressive,
        )

        a = m_decode_jpeg("/root/testdata/sf0.001").to_pandas() \
            .sort_values("item_id").reset_index(drop=True)
        b = m_decode_jpeg_progressive("/root/testdata/sf0.001").to_pandas() \
            .sort_values("item_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_golden_progressive_with_restart_markers(self):
        """Hand-built 16×8 gray progressive stream with DRI=1 and RST0
        between the two blocks: the DC predictor MUST reset at the
        restart (block 2 decodes 24, not 40+24) and the AC scan's
        segment walk must resync. Every byte derived by hand from
        T.81; identity quant table, DC-only blocks → two flat 8×8
        tiles at round(40/8+128)=133 and round(24/8+128)=131."""
        from complexity_driven_feature_construction_ray.stages.jpeg import decode_jpeg

        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + (1).to_bytes(2, "big")
        out += b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
        out += (8).to_bytes(2, "big") + (16).to_bytes(2, "big") + b"\x01"
        out += bytes([1, 0x11, 0])
        # DC first scan, Al=0: DHT class0 canonical '0'->size6, '10'->size5
        out += b"\xff\xc4" + (21).to_bytes(2, "big") + b"\x00"
        out += bytes([1, 1] + [0] * 14) + bytes([6, 5])
        out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
        out += bytes([1, 0x00]) + bytes([0, 0, 0x00])
        # block 1: diff=40 -> '0' + '101000', pad '1' = 0x51
        out += bytes([0b01010001])
        out += b"\xff\xd0"  # RST0 — predictor resets here
        # block 2: diff=24 (post-reset) -> '10' + '11000', pad '1' = 0xB1
        out += bytes([0b10110001])
        # AC scan 1..63, all-EOB per block, restart applies here too
        out += b"\xff\xc4" + (20).to_bytes(2, "big") + b"\x10"
        out += bytes([1] + [0] * 15) + bytes([0x00])
        out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
        out += bytes([1, 0x00]) + bytes([1, 63, 0x00])
        out += bytes([0b01111111])  # EOB, pad
        out += b"\xff\xd0"
        out += bytes([0b01111111])  # EOB, pad
        out += b"\xff\xd9"

        got = decode_jpeg(bytes(out))[:, :, 0]
        assert got.shape == (8, 16)
        assert (got[:, :8] == 133).all()   # 40/8 + 128 = 133
        assert (got[:, 8:] == 131).all()   # 24/8 + 128 = 131 (pred reset)

    def test_progressive_prefix_decodability(self):
        """THE defining progressive property: truncating the stream at
        any scan boundary (+EOI) still decodes to a full-size image,
        and each additional scan refines toward the final result
        (monotone non-increasing mean-abs-error, hitting 0 at the full
        stream). Exercises every partial coefficient state the
        refinement scans pass through."""
        from complexity_driven_feature_construction_ray.stages.jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        payload = encode_jpeg_progressive(img, quality=60)
        # scan boundaries = every SOS marker after the first
        cuts = []
        i = payload.find(b"\xff\xda")
        j = payload.find(b"\xff\xda", i + 2)
        while j != -1:
            cuts.append(j)
            j = payload.find(b"\xff\xda", j + 2)
        assert len(cuts) >= 5  # the IJG color script has 10 scans
        full = decode_jpeg(payload).astype(np.float64)
        maes = []
        for cut in cuts:
            part = decode_jpeg(payload[:cut] + b"\xff\xd9")
            assert part.shape == full.shape
            maes.append(float(np.abs(part.astype(np.float64) - full).mean()))
        maes.append(0.0)  # the full stream
        # refinement must never move AWAY from the final image by more
        # than rounding noise between consecutive prefixes
        for a, b in zip(maes, maes[1:]):
            assert b <= a + 0.75, maes
        assert maes[0] > maes[-2] or maes[0] == 0.0  # scans actually refine

"""OPERATORS.md must stay in sync with the registry."""

import sys

sys.path.insert(0, "/root/repo")


def test_operators_md_in_sync():
    from tools.gen_operators_md import render

    assert open("/root/repo/OPERATORS.md").read() == render(), (
        "OPERATORS.md stale — run python tools/gen_operators_md.py"
    )


class TestMediaCodec:
    """Real codec layer (media_codec.py): dependency-free PNG/PPM/WAV."""

    def test_png_roundtrip_rgb_and_grey(self):
        import numpy as np
        from libcolumnfile_spark.operators import media_codec as mc

        px = (np.arange(24 * 17 * 3).reshape(17, 24, 3) % 256).astype(np.uint8)
        d = mc.decode_png(mc.encode_png(px))
        assert (d["width"], d["height"], d["channels"]) == (24, 17, 3)
        assert abs(d["pixel_mean"] - px.mean()) < 1e-9
        g = (np.arange(8 * 5).reshape(5, 8) % 256).astype(np.uint8)
        d2 = mc.decode_png(mc.encode_png(g))
        assert (d2["width"], d2["height"], d2["channels"]) == (8, 5, 1)

    def test_png_all_filter_types_unfilter(self):
        """Decode must reverse every PNG row filter (0-4), not just the
        filter-0 rows our encoder writes."""
        import struct
        import zlib

        import numpy as np
        from libcolumnfile_spark.operators import media_codec as mc

        h, w, ch = 4, 6, 3
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (h, w * ch)).astype(np.uint8)

        def filt(y, ftype):
            row = img[y].astype(np.int32)
            prev = img[y - 1].astype(np.int32) if y else np.zeros(w * ch, np.int32)
            out = np.zeros(w * ch, np.int32)
            for x in range(w * ch):
                a = img[y][x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if (x >= ch and y) else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (int(a) + int(b)) // 2
                else:
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (int(row[x]) - int(pred)) & 0xFF
            return bytes([ftype]) + bytes(out.astype(np.uint8))

        raw = b"".join(filt(y, [0, 1, 2, 3, 4][y % 5]) for y in range(h))
        png = (
            mc.PNG_MAGIC
            + mc._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + mc._png_chunk(b"IDAT", zlib.compress(raw))
            + mc._png_chunk(b"IEND", b"")
        )
        d = mc.decode_png(png)
        assert abs(d["pixel_mean"] - img.mean()) < 1e-9

    def test_ppm_roundtrip_and_sniff(self):
        import numpy as np
        from libcolumnfile_spark.operators import media_codec as mc

        px = (np.arange(10 * 7 * 3).reshape(7, 10, 3) % 256).astype(np.uint8)
        d = mc.decode_image(mc.encode_ppm(px))
        assert d["fmt"] == "ppm" and (d["width"], d["height"]) == (10, 7)
        assert abs(d["pixel_mean"] - px.mean()) < 1e-9

    def test_wav_roundtrip_exact_rms(self):
        import numpy as np
        from libcolumnfile_spark.operators import media_codec as mc

        s = np.full(16000, 123, dtype=np.int16)
        d = mc.decode_wav(mc.encode_wav(s, 8000))
        assert d == {
            "fmt": "wav", "sample_rate": 8000, "channels": 1,
            "n_frames": 16000, "duration_ms": 2000, "rms": 123.0,
        }

    def test_jpeg_is_the_honest_stub_boundary(self):
        import pytest as _pytest
        from libcolumnfile_spark.operators import media_codec as mc

        with _pytest.raises(NotImplementedError):
            mc.decode_image(b"\xff\xd8\xff\xe0fakejpeg")

    def test_resize_nearest_preserves_constant_mean(self):
        import numpy as np
        from libcolumnfile_spark.operators import media_codec as mc

        px = np.full((50, 80, 3), 77, dtype=np.uint8)
        r = mc.resize_nearest(px, 32, 20)
        assert r.shape == (20, 32, 3)
        assert float(r.mean()) == 77.0

    def test_decode_media_spark_roundtrip(self, spark):
        """Spark-side end-to-end: encode_media -> decode_media recovers
        the metadata-derived properties for every kind."""
        from libcolumnfile_spark.operators import multimodal as mm

        enc = mm.encode_media(mm.media_table(spark, "/root/testdata/sf0.001"))
        got = {r["media_id"]: r for r in mm.decode_media(enc).collect()}
        assert len(got) == 500
        img = [r for r in got.values() if r["kind"] == "image"]
        assert img and all(r["fmt"] in ("png", "ppm") for r in img)
        assert all(r["pixel_mean"] == float(r["media_id"] % 256) for r in img)
        aud = [r for r in got.values() if r["kind"] == "audio"]
        assert aud and all(r["fmt"] == "wav" and r["sample_rate"] == 8000 for r in aud)
        vid = [r for r in got.values() if r["kind"] == "video"]
        assert vid and all(r["fmt"] == "unsupported" for r in vid)

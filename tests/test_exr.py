"""Native EXR codec (data/exr.py): roundtrips + header handling.

The reference reads Cleargrasp EXRs through cv2's OpenEXR bindings
(cleargrasp/dataset.py:328-341); this image's cv2 ships WITHOUT OpenEXR,
so the rebuild carries its own scanline codec and these tests are the
only thing standing between the transparent data path and silently
unreadable ground truth.
"""

import numpy as np
import pytest

from pose_estimation_tpu.data.exr import read_exr, write_exr


@pytest.fixture
def img3(rng):
    return rng.rand(37, 53, 3).astype(np.float32) * 4.0 - 1.0


class TestRoundtrip:
    @pytest.mark.parametrize("compression", ["none", "zip", "zips"])
    def test_float32_rgb_exact(self, tmp_path, img3, compression):
        p = str(tmp_path / "a.exr")
        write_exr(p, img3, compression=compression)
        out = read_exr(p)
        np.testing.assert_array_equal(out, img3)

    @pytest.mark.parametrize("compression", ["none", "zip"])
    def test_half_rgb(self, tmp_path, img3, compression):
        p = str(tmp_path / "a.exr")
        write_exr(p, img3, compression=compression, half=True)
        out = read_exr(p)
        np.testing.assert_array_equal(out, img3.astype(np.float16))

    def test_single_channel(self, tmp_path, rng):
        d = (rng.rand(24, 31) * 3.0).astype(np.float32)
        p = str(tmp_path / "d.exr")
        write_exr(p, d, compression="zip")
        out = read_exr(p)
        assert out.shape == (24, 31)
        np.testing.assert_array_equal(out, d)

    def test_chunk_boundary_heights(self, tmp_path, rng):
        """ZIP chunks are 16 scanlines; heights around the boundary must
        roundtrip (partial final chunk)."""
        for h in (15, 16, 17, 32, 33):
            a = rng.rand(h, 8, 3).astype(np.float32)
            p = str(tmp_path / f"h{h}.exr")
            write_exr(p, a, compression="zip")
            np.testing.assert_array_equal(read_exr(p), a)

    def test_incompressible_rows_stored_raw(self, tmp_path, rng):
        """When zlib inflates (random bytes), the writer stores the raw
        chunk and the reader must detect size == raw_size."""
        a = rng.rand(4, 4, 3).astype(np.float32)
        p = str(tmp_path / "r.exr")
        write_exr(p, a, compression="zips")
        np.testing.assert_array_equal(read_exr(p), a)


class TestFormat:
    def test_rejects_non_exr(self, tmp_path):
        p = str(tmp_path / "x.exr")
        with open(p, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\nnot an exr")
        with pytest.raises(ValueError):
            read_exr(p)

    def test_rgb_channel_order(self, tmp_path):
        """Channels are stored alphabetically (B,G,R) but returned in
        R,G,B order — the layout the reference's cv2+BGR2RGB path
        produced."""
        img = np.zeros((2, 2, 3), np.float32)
        img[..., 0] = 1.0   # R
        img[..., 2] = 3.0   # B
        p = str(tmp_path / "c.exr")
        write_exr(p, img, compression="none")
        out = read_exr(p)
        assert out[0, 0, 0] == 1.0 and out[0, 0, 2] == 3.0

    def test_decodes_third_party_bytes_if_present(self):
        """Spec check against bytes we didn't write: the CPython test
        suite ships a small EXR."""
        import glob
        cands = glob.glob("/usr/lib/python3*/test/imghdrdata/python.exr") \
            + glob.glob("/mnt/*/model_tools_env/*/python/install/lib/"
                        "python3*/test/imghdrdata/python.exr")
        if not cands:
            pytest.skip("no third-party EXR on this host")
        img = read_exr(cands[0])
        assert img.ndim == 3 and img.shape[0] > 0
        assert np.isfinite(img).all()


class TestClearGraspIntegration:
    def test_read_exr_fallback_used(self, tmp_path, rng):
        """data/cleargrasp.read_exr must decode via the native codec even
        when cv2 lacks OpenEXR (this image's build)."""
        from pose_estimation_tpu.data.cleargrasp import read_exr as cg_read
        a = np.repeat(rng.rand(10, 12, 1).astype(np.float32), 3, -1)
        p = str(tmp_path / "d.exr")
        write_exr(p, a, compression="zip")
        out = cg_read(p)
        np.testing.assert_allclose(out, a)

    def test_missing_file_raises_filenotfound(self, tmp_path):
        from pose_estimation_tpu.data.cleargrasp import read_exr as cg_read
        with pytest.raises(FileNotFoundError):
            cg_read(str(tmp_path / "nope.exr"))

import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.io.dataset import (
    DatasetSequence, export_sequence, parse_index, preprocess_bird_mask,
)


class TestDatasetRoundTrip:
    def test_export_and_load(self, tmp_path):
        cfg = SystemConfig()
        seq = synthetic.make_sequence(cfg, n_frames=3, kind="straight")
        root = str(tmp_path / "seq")
        export_sequence(seq, root)

        ds = DatasetSequence.open(root, ext=".npy")
        # synthetic frames are already cropped/sized: disable driver preprocessing
        ds.crop = None
        ds.downsample = 1
        assert len(ds) == 3
        fr = ds.frame(1)
        np.testing.assert_allclose(fr["front"], seq.frames[1]["front"], atol=1e-3)
        np.testing.assert_allclose(fr["bird"], seq.frames[1]["bird"], atol=1e-3)
        # the loader applies the driver's ConvertMaskBirdview preprocessing
        np.testing.assert_array_equal(
            fr["mask"], preprocess_bird_mask(seq.frames[1]["mask"], cfg.bird))
        np.testing.assert_allclose(fr["contour"], seq.frames[1]["contour"], atol=1e-3)
        np.testing.assert_allclose(fr["odom"], seq.odom[1], atol=1e-5)
        np.testing.assert_allclose(fr["gt"], seq.gt[1], atol=1e-5)

    def test_pgm_export_and_prefetched_iter(self, tmp_path):
        cfg = SystemConfig()
        seq = synthetic.make_sequence(cfg, n_frames=3, kind="straight")
        root = str(tmp_path / "seqp")
        export_sequence(seq, root, fmt="pgm")
        ds = DatasetSequence.open(root, ext=".pgm")
        ds.crop = None
        ds.downsample = 1
        frames = list(ds.iter_prefetched())
        assert len(frames) == 3
        # PGM quantizes to uint8: compare within 1 intensity level
        np.testing.assert_allclose(frames[2]["front"], seq.frames[2]["front"], atol=1.0)
        np.testing.assert_allclose(frames[2]["bird"], seq.frames[2]["bird"], atol=1.0)
        np.testing.assert_array_equal(
            frames[2]["mask"], preprocess_bird_mask(seq.frames[2]["mask"], cfg.bird))

    def test_mask_preprocess_blanks_footprint(self):
        cfg = SystemConfig()
        m = np.ones((cfg.bird.rows, cfg.bird.cols), bool)
        out = preprocess_bird_mask(m, cfg.bird)
        cy, cx = cfg.bird.rows // 2, cfg.bird.cols // 2
        assert not out[cy, cx]                  # footprint blanked
        assert not out[0, 0]                    # border eroded
        assert out[20, 20]                      # far field survives

    def test_parse_index_format(self, tmp_path):
        p = tmp_path / "associate.txt"
        p.write_text("1.5 2.0 -3.0 0.1 000001\n\n2.5 2.5 -3.1 0.2 000002\n")
        idx = parse_index(str(p))
        assert idx.stems == ["000001", "000002"]
        np.testing.assert_allclose(idx.timestamps, [1.5, 2.5])
        np.testing.assert_allclose(idx.poses[1], [2.5, -3.1, 0.2])

    def test_pgm_reader(self, tmp_path):
        from fishbirdeyevisualslam_tpu.io.dataset import _imread_gray
        img = (np.arange(48, dtype=np.uint8).reshape(6, 8))
        p = tmp_path / "t.pgm"
        with open(p, "wb") as f:
            f.write(b"P5\n# comment\n8 6\n255\n" + img.tobytes())
        out = _imread_gray(str(p))
        np.testing.assert_array_equal(out, img.astype(np.float32))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

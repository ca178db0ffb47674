"""Native prefetcher binding: ordering, PGM parsing, leak-freedom."""
import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.runtime.native import Prefetcher, get_library
from fishbirdeyevisualslam_tpu.io.dataset import write_pgm


@pytest.fixture()
def pgm_files(tmp_path):
    paths = []
    imgs = []
    rng = np.random.RandomState(0)
    for i in range(6):
        img = rng.randint(0, 255, (16 + i, 24), np.uint8)
        p = tmp_path / f"f{i}.pgm"
        write_pgm(str(p), img)
        paths.append(str(p))
        imgs.append(img)
    return paths, imgs


class TestPrefetcher:
    def test_order_and_content(self, pgm_files):
        paths, imgs = pgm_files
        pf = Prefetcher(paths, capacity=3)
        for i in range(len(paths)):
            arr = pf.next()
            if pf.is_native:
                np.testing.assert_array_equal(arr, imgs[i])
            # no buffers held after next() returns (leak-freedom)
            assert pf.outstanding() == 0
        assert pf.next() is None  # exhausted
        pf.close()

    def test_destroy_midway_frees(self, pgm_files):
        paths, _ = pgm_files
        pf = Prefetcher(paths, capacity=2)
        pf.next()
        pf.close()  # must not hang or leak (ready + outstanding freed in C)

    def test_native_available(self):
        # the environment ships g++; the native path must actually build
        assert get_library() is not None


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

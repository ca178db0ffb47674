"""FrameDrawer-parity overlay rendering (io/viz.py) — host-side, no compiles."""
import numpy as np

from fishbirdeyevisualslam_tpu.io import viz


def test_draw_frame_overlay_marks_keypoints():
    img = np.zeros((120, 160), np.float32)
    uv = np.array([[40.0, 40.0], [100.0, 60.0], [150.0, 110.0]])
    matched = np.array([True, False, True])
    valid = np.array([True, True, True])
    out = viz.draw_frame_overlay(img, uv, matched, valid, state=1)
    assert out.shape == (140, 160, 3) and out.dtype == np.uint8
    # green square around the first matched keypoint
    assert (out[37, 37:44] == [40, 220, 60]).all(axis=-1).any()
    # blue square around the unmatched one
    assert (out[58, 98:103] == [80, 140, 255]).all(axis=-1).any()
    # status strip encodes OK state (greenish)
    assert tuple(out[130, 159]) == (30, 120, 30)


def test_draw_bird_overlay_contour_recolor():
    img = np.full((64, 64), 200.0, np.float32)
    contour = np.full((64, 64), 255.0, np.float32)
    contour[10, :] = 0.0  # an edge row
    uv = np.array([[32.0, 32.0]])
    out = viz.draw_bird_overlay(img, uv, np.array([True]), np.array([True]),
                                contour=contour)
    # edge row tinted toward red, freespace untouched gray
    assert out[10, 5, 0] > out[10, 5, 1]
    assert tuple(out[40, 5]) == (200, 200, 200)


def test_frame_drawer_roundtrip(tmp_path):
    class _F:
        uv_raw = np.array([[10.0, 10.0]])
        kp_valid = np.array([True])
        bird_uv = np.array([[5.0, 5.0]])
        bird_kp_valid = np.array([True])

    class _Sys:
        last_frame = _F()
        last_assoc = None
        state = 1

    d = viz.FrameDrawer()
    d.update(_Sys(), np.zeros((40, 50), np.float32), np.zeros((30, 30), np.float32))
    p = tmp_path / "frame.png"
    d.save(str(p))
    assert p.exists() and p.stat().st_size > 0

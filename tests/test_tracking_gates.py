"""Scale-invariance / frustum gate tests for map-point matching
(``Frame::isInFrustum`` + ``MapPoint::PredictScale`` semantics; the gates are
ON by default since round 2 — BASE pins them off to test the delta)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig, CapacityConfig, TrackingConfig
from fishbirdeyevisualslam_tpu.geometry import se3, camera as cam_ops
from fishbirdeyevisualslam_tpu.slam.frame import desc_pm1_from_packed as pm1_from_packed
from fishbirdeyevisualslam_tpu.slam import map_state as ms
from fishbirdeyevisualslam_tpu.slam import tracking as tr
from fishbirdeyevisualslam_tpu.slam.frame import Frame

BASE = SystemConfig().replace(capacity=CapacityConfig(
    max_keyframes=8, max_points=64, max_bird_points=32,
    max_obs_per_point=4, max_front_kp=32, max_bird_kp=32,
    max_local_kfs=4, max_local_points=32)).replace(
    tracking=TrackingConfig(use_frustum_gates=False, use_level_window=False))
# BASE and GATED differ in EXACTLY one flag (use_frustum_gates) so the
# comparison is a single-variable delta; the octave window stays off in both —
# it would also gate these synthetic octave-0 features (their scale ranges
# imply a high predicted level) and confound the frustum-gate assertions
GATED = BASE.replace(tracking=TrackingConfig(use_frustum_gates=True,
                                             use_level_window=False))


def make_frame_and_map(point_dists, min_dists, max_dists, normals=None, seed=0):
    """Points straight ahead at given camera distances; the frame observes each
    with a matching descriptor at the projected pixel."""
    cfg = BASE
    n = len(point_dists)
    F = cfg.capacity.max_front_kp
    rng = np.random.RandomState(seed)
    m = ms.empty_map(cfg)
    Xw = np.stack([np.linspace(-2, 2, n), np.zeros(n), np.asarray(point_dists)], -1)
    desc = rng.randint(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    P = cfg.capacity.max_points
    m = m._replace(
        mp_pos=m.mp_pos.at[:n].set(jnp.asarray(Xw, jnp.float32)),
        mp_desc=m.mp_desc.at[:n].set(jnp.asarray(desc)),
        mp_desc_pm1=m.mp_desc_pm1.at[:n].set(
            pm1_from_packed(jnp.asarray(desc))),
        mp_valid=m.mp_valid.at[:n].set(True),
        mp_min_dist=m.mp_min_dist.at[:n].set(jnp.asarray(min_dists, jnp.float32)),
        mp_max_dist=m.mp_max_dist.at[:n].set(jnp.asarray(max_dists, jnp.float32)),
        mp_normal=m.mp_normal.at[:n].set(
            jnp.asarray(normals if normals is not None
                        else np.tile([0, 0, 1.0], (n, 1)), jnp.float32)),
    )
    uv = np.asarray(cam_ops.project_pinhole(cfg.camera, jnp.asarray(Xw, jnp.float32)))
    pad8 = np.zeros((F, 8), np.uint32)
    pad8[:n] = desc
    uvp = np.zeros((F, 2), np.float32)
    uvp[:n] = uv
    kp_valid = np.zeros(F, bool)
    kp_valid[:n] = True
    FB = cfg.capacity.max_bird_kp
    f = Frame(
        uv_raw=jnp.asarray(uvp), uv=jnp.asarray(uvp),
        octave=jnp.zeros(F, jnp.int32), angle=jnp.zeros(F),
        desc=jnp.asarray(pad8), desc_pm1=pm1_from_packed(jnp.asarray(pad8)),
        kp_valid=jnp.asarray(kp_valid),
        bird_uv=jnp.zeros((FB, 2)), bird_octave=jnp.zeros(FB, jnp.int32),
        bird_desc=jnp.zeros((FB, 8), jnp.uint32),
        bird_desc_pm1=pm1_from_packed(jnp.zeros((FB, 8), jnp.uint32)),
        bird_kp_valid=jnp.zeros(FB, bool),
        bird_base=jnp.zeros((FB, 3)), bird_cam=jnp.zeros((FB, 3)),
        odom=jnp.zeros(3), timestamp=jnp.asarray(0.0),
    )
    return m, f


class TestFrustumGates:
    def test_distance_range_gate(self):
        # point 0: within range; point 1: camera far outside its max range
        m, f = make_frame_and_map(
            point_dists=[10.0, 10.0],
            min_dists=[1.0, 1.0],
            max_dists=[50.0, 5.0],   # point 1: dist 10 > 1.2 * 5
        )
        cand = jnp.ones(m.mp_pos.shape[0], bool)
        Tcw = se3.identity()
        res_off, vis_off = tr.match_map_points(
            m, f, BASE, Tcw, cand, jnp.float32(12.0), jnp.float32(100.0),
            frustum_gates=True)
        res_on, vis_on = tr.match_map_points(
            m, f, GATED, Tcw, cand, jnp.float32(12.0), jnp.float32(100.0),
            frustum_gates=True)
        assert bool(vis_off[0]) and bool(vis_off[1])   # flag off: both visible
        assert bool(vis_on[0]) and not bool(vis_on[1])  # flag on: range-gated
        assert int(res_on.count) == 1

    def test_viewcos_gate(self):
        # point 1's mean normal points AWAY from the current viewing ray
        m, f = make_frame_and_map(
            point_dists=[10.0, 10.0],
            min_dists=[1.0, 1.0],
            max_dists=[50.0, 50.0],
            normals=[[0, 0, 1.0], [0, 0, -1.0]],
        )
        cand = jnp.ones(m.mp_pos.shape[0], bool)
        res_on, vis_on = tr.match_map_points(
            m, f, GATED, se3.identity(), cand, jnp.float32(12.0), jnp.float32(100.0),
            frustum_gates=True)
        assert bool(vis_on[0]) and not bool(vis_on[1])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

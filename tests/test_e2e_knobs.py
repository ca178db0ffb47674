"""Extension-knob e2e (r4 extensions: loop odometry vet, pressure/LOST
eviction valves) + the full reference_parity() preset run.

Own module (not in test_e2e_flags.py): XLA:CPU segfaults reproducibly on the
5th+ large compile in one process on this host (backend_compile_and_load —
same family as the AOT-reload crash burned into tests/conftest.py); one
module per process keeps every compile early in process lifetime.
"""
import dataclasses

import pytest

from fishbirdeyevisualslam_tpu.config import reference_parity
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
from fishbirdeyevisualslam_tpu.slam.system import SlamSystem

from e2e_common import E2E_CFG
from test_e2e_flags import _run_cfg

pytestmark = pytest.mark.heavy


class TestExtensionKnobs:
    """The r4 extension knobs (loop odometry vet, pressure/LOST eviction
    valves) must switch off cleanly — ``reference_parity()`` pins them off."""

    def test_reference_parity_preset_tracks(self):
        # the full parity preset, at reduced capacities: every deliberate
        # deviation pinned back to reference semantics still initializes and
        # tracks the clean arc
        parity = reference_parity()
        cfg = E2E_CFG.replace(bird=parity.bird, ba=parity.ba,
                              tracking=dataclasses.replace(
                                  parity.tracking))
        assert cfg.tracking.loop_odom_vet is False
        assert cfg.tracking.point_pressure_valve is False
        assert cfg.tracking.lost_eviction_valve is False
        sys_, seq = _run_cfg(cfg)
        states = [e.state for e in sys_.trajectory]
        assert states[-1] == 1
        est = sys_.frame_trajectory_Twb()
        assert ate_rmse_vs_gt(est, seq.gt) < 0.3

    def test_pressure_valve_off_never_evicts(self):
        import numpy as np
        import jax.numpy as jnp
        from fishbirdeyevisualslam_tpu.slam import map_state as ms
        from fishbirdeyevisualslam_tpu.slam import tracking as tr
        from fishbirdeyevisualslam_tpu.config import SystemConfig, CapacityConfig

        cfg = SystemConfig().replace(
            capacity=CapacityConfig(
                max_keyframes=16, max_points=128, max_bird_points=64,
                max_obs_per_point=8, max_front_kp=32, max_bird_kp=32,
                max_local_kfs=4, max_local_points=64,
                max_local_bird_points=32),
            tracking=dataclasses.replace(SystemConfig().tracking,
                                         point_pressure_valve=False))
        m = ms.empty_map(cfg)
        P = cfg.capacity.max_points
        m = m._replace(
            kf_valid=m.kf_valid.at[0].set(True),
            kf_seq=m.kf_seq.at[0].set(0),
            n_kf=jnp.int32(1), kf_counter=jnp.int32(1),
            mp_valid=jnp.ones((P,), bool),
        )
        # with the valve off, local_mapping_pre must not free any slots via
        # pressure relief (cull_points may still retire genuinely bad points,
        # but a saturated zero-obs store is exactly what cull_points ALSO
        # retires — so call the valve entry directly)
        before = int(np.asarray(m.mp_valid).sum())
        if cfg.tracking.point_pressure_valve:
            m2 = tr.relieve_point_pressure(m, cfg, jnp.int32(0))
        else:
            m2 = m
        assert int(np.asarray(m2.mp_valid).sum()) == before

"""Time the REAL fused frame program (``tracking.track_frame_core``) on the
selected backend with a realistic populated MapState, isolating it from host
state-machine overhead.  Compares single-radius vs dual-radius motion-model
matching and optionally dumps a profiler trace (FBEV_TRACE=1)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), flush=True)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.slam import map_state as ms, tracking as tr
from fishbirdeyevisualslam_tpu.slam.frame import build_frame

cfg = SystemConfig()
cap = cfg.capacity
rng = np.random.RandomState(0)

# populated map at full capacity
m = ms.empty_map(cfg)
P = cap.max_points
PB = cap.max_bird_points
K = min(cap.max_keyframes, 32)
m = m._replace(
    mp_pos=jnp.asarray(np.stack([
        rng.uniform(-10, 10, P), rng.uniform(-5, 5, P), rng.uniform(5, 40, P)
    ], -1).astype(np.float32)),
    mp_desc=jnp.asarray(rng.randint(0, 2**32, (P, 8), dtype=np.uint64).astype(np.uint32)),
    mp_desc_pm1=jnp.asarray(rng.choice([-1.0, 1.0], (P, 256)).astype(np.float32), jnp.bfloat16),
    mp_valid=jnp.ones((P,), bool),
    mp_max_dist=jnp.full((P,), 60.0),
    mp_min_dist=jnp.full((P,), 1.0),
    bp_pos=jnp.asarray(np.stack([
        rng.uniform(2, 12, PB), rng.uniform(-6, 6, PB), np.zeros(PB)
    ], -1).astype(np.float32)),
    bp_desc=jnp.asarray(rng.randint(0, 2**32, (PB, 8), dtype=np.uint64).astype(np.uint32)),
    bp_desc_pm1=jnp.asarray(rng.choice([-1.0, 1.0], (PB, 256)).astype(np.float32), jnp.bfloat16),
    bp_valid=jnp.ones((PB,), bool),
    bp_ref_kf=jnp.zeros((PB,), jnp.int32),
    kf_valid=m.kf_valid.at[:K].set(True),
    n_kf=jnp.int32(K),
    obs_kf=m.obs_kf.at[:, 0].set(jnp.arange(P, dtype=jnp.int32) % K),
    obs_valid=m.obs_valid.at[:, 0].set(True),
)

front = jnp.asarray(rng.rand(cfg.camera.height, cfg.camera.width).astype(np.float32) * 255)
bird = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
mask = jnp.ones((cfg.bird.rows, cfg.bird.cols), jnp.float32) * 255

f = build_frame(front, bird, mask, jnp.zeros(3), jnp.asarray(0.0), cfg,
                cap.max_front_kp, None, cap.max_bird_kp)
f_last = f._replace(odom=jnp.asarray([-0.3, 0.0, 0.0]))
last_bp = jnp.full((cap.max_bird_kp,), -1, jnp.int32)
Tcw = se3.identity()
cand = jnp.ones((P,), bool)

step = jax.jit(tr.track_frame_core, static_argnums=(2,))


def full_step(m, f, Tcw, cand):
    """The REAL per-frame program as the system drives it: ref-KF policy
    scalars + per-frame bird maintenance included."""
    return step(m, f, cfg, Tcw, cand, jnp.int32(0),
                tr.bird_only_view(f_last), last_bp, Tcw, jnp.asarray(True))


def timeit(label, fn, *args, reps=20):
    # vary the pose per repetition (identical-input executions can be deduped
    # by the experimental tunnel backend, see the scanned-stream note below)
    out = fn(*args)
    jax.block_until_ready(out)
    poses = [jnp.asarray(np.asarray(args[-2]) + np.array(
        [0, 0, 0, 0, 1e-4 * (r + 1), 0, 0], np.float32)) for r in range(reps)]
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(*args[:-2], poses[r], args[-1])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt * 1e3:.3f} ms", flush=True)
    return dt


t_core = timeit("track_frame_core (dispatch each call)", full_step, m, f, Tcw, cand)

# scanned stream (host out of the loop) — chip-work-only number
N = 16

@jax.jit
def stream(m, f, Tcw):
    def body(c, i):
        out = full_step(m, f._replace(timestamp=f.timestamp + i), c, cand)
        return out.Tcw, out.scalars
    T, s = jax.lax.scan(body, Tcw, jnp.arange(N, dtype=jnp.float32))
    return T, s

out = stream(m, f, Tcw)
jax.block_until_ready(out)
# vary the seed pose per repetition: the axon tunnel backend can DEDUPE
# byte-identical executions, reporting fantasy sub-µs timings (observed
# 0.01 ms/frame for a 2 ms program) — varied inputs defeat any such layer
reps = 5
seeds = [jnp.asarray(np.asarray(Tcw) + np.array([0, 0, 0, 0, 1e-4 * (r + 1), 0, 0],
                                                np.float32)) for r in range(reps)]
t0 = time.perf_counter()
for r in range(reps):
    out = stream(m, f, seeds[r])
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / (reps * N)
print(f"track_frame_core (scanned stream): {dt * 1e3:.3f} ms -> {1/dt:.1f} fps", flush=True)

if os.environ.get("FBEV_TRACE"):
    with jax.profiler.trace("/tmp/fbev_trace"):
        for _ in range(5):
            out = full_step(m, f, Tcw, cand)
        jax.block_until_ready(out)
    print("trace written to /tmp/fbev_trace", flush=True)

"""jax.profiler device trace of the full bench.py stream (build_frame +
track_frame_core scanned) at shipped capacities — attribute the r4 255->215
fps regression to specific XLA ops."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import gzip
import json

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), flush=True)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.slam import map_state as ms, tracking as tr
from fishbirdeyevisualslam_tpu.slam.frame import build_frame
from scripts.bench_frame_pieces_r5 import make_state

cfg = SystemConfig()
cap = cfg.capacity
m, f0, f_last, last_bp, cand, assoc = make_state(cfg)
cam = cfg.camera
rng = np.random.RandomState(1)
front_img = jnp.asarray(rng.rand(cam.height, cam.width).astype(np.float32) * 255)
bird_img = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
bmask = jnp.ones((cfg.bird.rows, cfg.bird.cols), jnp.float32) * 255
Tcw = se3.identity()
n_stream = 16


@jax.jit
def stream(front_img, bird_img, Tcw0):
    def body(carry, i):
        T = carry
        f = build_frame(front_img + i.astype(jnp.float32), bird_img, bmask,
                        jnp.zeros(3), i.astype(jnp.float32), cfg,
                        cap.max_front_kp, None, cap.max_bird_kp)
        out = tr.track_frame_core(m, f, cfg, T, cand, jnp.int32(0),
                                  tr.bird_only_view(f_last), last_bp, T,
                                  jnp.asarray(True))
        return out.Tcw, out.scalars
    T_final, nsc = jax.lax.scan(body, Tcw0, jnp.arange(n_stream))
    return T_final, nsc


out = stream(front_img, bird_img, Tcw)
jax.block_until_ready(out[0])

outdir = "/tmp/fbev_trace_track_r5"
with jax.profiler.trace(outdir):
    out = stream(front_img, bird_img, Tcw.at[4].add(1e-4))
    jax.block_until_ready(out[0])

files = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
print("trace files:", files)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    from collections import defaultdict
    tot = defaultdict(float)
    cnt = defaultdict(int)
    # keep only TPU-core op lanes (pid names like "/device:TPU:0 ...")
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "Device" in n}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev and ev.get("pid") in dev_pids:
            name = ev.get("name", "?")
            tot[name] += ev["dur"]
            cnt[name] += 1
    print(f"{'ms total':>9}  {'ms/frame':>9}  {'n':>5}  op")
    for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{dur/1e3:9.2f}  {dur/1e3/n_stream:9.4f}  {cnt[name]:5d}  {name[:100]}")

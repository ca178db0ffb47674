"""jax.profiler trace of one production global_ba call on chip."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.slam.loop_closing import global_ba
from scripts.bench_scaling import make_realistic_map

cfg = SystemConfig()
m = make_realistic_map(cfg)
out = global_ba(m, cfg, 10)
jax.block_until_ready(out.kf_Tcw)

outdir = "/tmp/fbev_trace_gba"
with jax.profiler.trace(outdir):
    out = global_ba(m._replace(kf_Tcw=m.kf_Tcw.at[1:, 4].add(1e-5)), cfg, 10)
    jax.block_until_ready(out.kf_Tcw)

# summarize: find the trace.json.gz and aggregate XLA op durations
files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    from collections import defaultdict
    tot = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            cat = ev.get("name", "?")
            pid = ev.get("pid", -1)
            tot[(pid, cat)] += ev["dur"]
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    for (pid, name), dur in top:
        print(f"{dur/1e3:9.2f} ms  pid={pid}  {name[:110]}")

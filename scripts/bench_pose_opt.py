import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), jax.devices())

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3, camera as cam_ops
from fishbirdeyevisualslam_tpu.solvers.pose_opt import FrontObs, BirdObs, pose_optimization
from fishbirdeyevisualslam_tpu.solvers.pallas_pose_opt import pose_optimization_fused

CFG = SystemConfig()
rng = np.random.RandomState(0)
n, nb = 2048, 2048
Xw = np.stack([rng.uniform(-8,8,n), rng.uniform(-4,4,n), rng.uniform(8,30,n)],-1).astype(np.float32)
Tcw_true = se3.exp(jnp.asarray([0.02,-0.01,0.03,0.3,-0.1,0.2],jnp.float32))
uv = np.array(cam_ops.project_pinhole(CFG.camera, se3.transform(Tcw_true, jnp.asarray(Xw))))
uv += rng.randn(n,2).astype(np.float32)*0.5
valid = np.zeros(n,bool); valid[:1500]=True
front = FrontObs(jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(n), jnp.asarray(valid))
Xb = np.stack([rng.uniform(2,12,nb), rng.uniform(-5,5,nb), np.zeros(nb)],-1).astype(np.float32)
Xc = np.array(se3.transform(Tcw_true, jnp.asarray(Xb))) + rng.randn(nb,3).astype(np.float32)*0.01
bvalid = np.zeros(nb,bool); bvalid[:600]=True
bird = BirdObs(jnp.asarray(Xb), jnp.asarray(Xc), jnp.ones(nb), jnp.asarray(bvalid))
T0 = se3.identity()

def timeit(fn, label, reps=20):
    out = fn(); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt=(time.perf_counter()-t0)/reps
    print(f"{label}: {dt*1e3:.3f} ms")
    return out

ref_fn = jax.jit(lambda: pose_optimization(CFG.camera, CFG.ba, T0, front, bird, prior_T=T0, prior_info=100.0))
fused_fn = jax.jit(lambda: pose_optimization_fused(CFG.camera, CFG.ba, T0, front, bird, prior_T=T0, prior_info=100.0))
r = timeit(ref_fn, "unfused")
f = timeit(fused_fn, "fused  ")
d = np.abs(np.asarray(se3.log(se3.compose(f.Tcw, se3.inverse(r.Tcw)))))
print("pose delta:", d.max(), "n_in ref/fused:", int(r.n_inliers), int(f.n_inliers))

# streamed version (host out of loop)
@jax.jit
def stream_ref(T0):
    def body(T, _):
        out = pose_optimization(CFG.camera, CFG.ba, T, front, bird, prior_T=T, prior_info=100.0)
        return out.Tcw, out.n_inliers
    Tf, ns = jax.lax.scan(body, T0, None, length=16)
    return Tf
@jax.jit
def stream_fused(T0):
    def body(T, _):
        out = pose_optimization_fused(CFG.camera, CFG.ba, T, front, bird, prior_T=T, prior_info=100.0)
        return out.Tcw, out.n_inliers
    Tf, ns = jax.lax.scan(body, T0, None, length=16)
    return Tf
for fn, lbl in ((stream_ref,"stream unfused"),(stream_fused,"stream fused  ")):
    out = fn(T0); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(5): out = fn(T0)
    jax.block_until_ready(out)
    print(f"{lbl}: {(time.perf_counter()-t0)/5/16*1e3:.3f} ms/step")

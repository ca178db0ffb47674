"""Defaults-vs-reference-parity e2e comparison (VERDICT r3 next #6).

Runs the 80-frame circle (clean + sensor-degraded) through BOTH the shipped
default config and ``config.reference_parity()`` — the preset pinning every
deliberate deviation back to reference semantics (filter_gate_mult=1,
pose_prior_info=0, level-0-only init matching) — and prints the table STATUS
records.  CPU (the e2e tier's backend)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TPU_MODE = os.environ.get("FBEV_EVAL_TPU", "") == "1"
if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if TPU_MODE:
    jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    jax.config.update("jax_platforms", "cpu")

from fishbirdeyevisualslam_tpu.config import SystemConfig, reference_parity
from scripts.robustness_eval import run


def main(n_frames=80):
    for name, cfg in (("defaults", SystemConfig()),
                      ("parity  ", reference_parity())):
        for degraded in (False, True):
            run(n_frames, "circle", 0.02, 0, use_contour=True,
                degraded=degraded, cfg=cfg, tag=f"[{name}] ")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    main(n)

import time
import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.io.tracing import Tracer, device_trace


def test_tracer_spans_accumulate():
    tr = Tracer()
    for _ in range(3):
        with tr.span("work"):
            time.sleep(0.002)
    rep = tr.report()
    assert rep["work"]["count"] == 3
    assert rep["work"]["total_s"] >= 0.006
    assert rep["work"]["max_s"] >= rep["work"]["mean_s"]
    tr.reset()
    assert tr.report() == {}


def test_tracer_disabled_is_free():
    tr = Tracer(enabled=False)
    with tr.span("x"):
        pass
    assert tr.report() == {}


def test_device_trace_writes_profile(tmp_path):
    import jax.numpy as jnp
    d = tmp_path / "trace"
    with device_trace(str(d)):
        jnp.ones(8).sum().block_until_ready()
    assert any(d.rglob("*")), "no profile files written"


def test_device_trace_none_noop():
    with device_trace(None):
        pass


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

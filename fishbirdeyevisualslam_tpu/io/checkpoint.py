"""Map checkpoint / resume.

The reference leaves ``SaveMap/LoadMap`` as a TODO (``include/System.h:132-134``);
here the functional map state makes checkpointing trivial — the entire map is one
pytree of arrays.  Saved as compressed npz (self-contained, no serving deps);
the same tree can be handed to orbax for async/distributed checkpointing when
running on a pod.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.slam.map_state import MapState


# Derived fields are NOT serialized: the expanded +/-1 descriptor operands are
# bf16 (numpy can't round-trip it) and fully determined by the packed uint32
# descriptors — they are rebuilt at load.
_DERIVED = {"mp_desc_pm1": "mp_desc", "bp_desc_pm1": "bp_desc"}


def save_map(m: MapState, path: str) -> None:
    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in m._asdict().items()
                                 if k not in _DERIVED})


def load_map(path: str) -> MapState:
    from fishbirdeyevisualslam_tpu.slam.frame import desc_pm1_from_packed

    data = np.load(path)
    fields = {}
    for k in MapState._fields:
        if k in _DERIVED:
            fields[k] = desc_pm1_from_packed(jnp.asarray(data[_DERIVED[k]]))
        elif k == "bp_gen" and k not in data:
            # field added after older checkpoints were written; generations
            # restart at zero (only async replay diffs consume them)
            fields[k] = jnp.zeros(data["bp_valid"].shape[0], jnp.int32)
        elif k == "n_pressure_evicted" and k not in data:
            fields[k] = jnp.int32(0)
        else:
            fields[k] = jnp.asarray(data[k])
    return MapState(**fields)

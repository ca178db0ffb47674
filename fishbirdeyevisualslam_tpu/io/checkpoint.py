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


def save_map(m: MapState, path: str) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in m._asdict().items()})


def load_map(path: str) -> MapState:
    data = np.load(path)
    fields = {}
    for k in MapState._fields:
        v = jnp.asarray(data[k])
        fields[k] = v
    return MapState(**fields)

"""Stream-state snapshot / resume.

The reference persists only camera-calibration profiles and CLI profiles
(SURVEY.md §5.4); stream state (delay queue, trajectory window, QA servos)
is ephemeral and rebuilt by `restart()`.  For long-running production
streams this module adds fault-tolerant snapshots as a genuine extension:
any filter state pytree (arrays + static dataclass fields) round-trips
through a single .npz file, so a crashed worker resumes mid-stream without
re-warming the smoothing window.
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import struct
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _canonical(obj: Any, out: list) -> None:
    """Flatten a settings object into a canonical token stream.

    Dataclasses contribute their type name plus every (field-name, value)
    pair in definition order; floats are serialized as their exact IEEE-754
    bits (repr round-trip quirks can't alias two distinct values or split one
    value into two spellings); enums by class+member name.  Anything else
    falls back to type-tagged repr, which is stable for str/int/bool/None.
    """
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out.append(f"<{type(obj).__qualname__}")
        for f in dataclasses.fields(obj):
            out.append(f.name + "=")
            _canonical(getattr(obj, f.name), out)
        out.append(">")
    elif isinstance(obj, enum.Enum):
        out.append(f"E:{type(obj).__qualname__}.{obj.name}")
    elif isinstance(obj, bool):  # before int: bool is an int subclass
        out.append(f"b:{obj}")
    elif isinstance(obj, float):
        out.append("f:" + struct.pack("<d", obj).hex())
    elif isinstance(obj, int):
        out.append(f"i:{obj}")
    elif isinstance(obj, (list, tuple)):
        out.append("[" if isinstance(obj, list) else "(")
        for item in obj:
            _canonical(item, out)
        out.append("]" if isinstance(obj, list) else ")")
    elif isinstance(obj, dict):
        out.append("{")
        for k in sorted(obj, key=repr):
            _canonical(k, out)
            out.append(":")
            _canonical(obj[k], out)
        out.append("}")
    elif isinstance(obj, (np.ndarray, jax.Array)):
        arr = np.asarray(obj)
        out.append(f"a:{arr.dtype}:{arr.shape}:" + arr.tobytes().hex())
    else:
        out.append(f"{type(obj).__qualname__}:{obj!r}")


def settings_fingerprint(filt: Any) -> str:
    """Stable hash of a filter's full configuration: a canonical walk of the
    frozen-dataclass tree (type names + field names + IEEE-bit-exact values,
    in class-definition order).

    Guards resume against a silently different configuration whose state
    happens to have matching leaf shapes (e.g. a retuned threshold): shapes
    alone can't catch value-only settings changes.  Unlike a plain repr()
    hash, this is robust to float repr round-trip quirks and to settings
    objects whose repr omits fields.
    """
    tokens: list = []
    _canonical(filt, tokens)
    return hashlib.sha256("\x00".join(tokens).encode()).hexdigest()[:16]


def save_state(path: str, state: Any, filt: Any | None = None) -> None:
    """Snapshot a filter-state pytree to an .npz file.  Pass the filter (or
    any settings object) to stamp its configuration fingerprint into the
    snapshot; load_state then refuses a mismatched configuration."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and jnp.issubdtype(leaf.dtype, jnp.bool_):
            arrays[f"leaf_{i}"] = np.asarray(leaf)
        elif hasattr(leaf, "dtype") and "key" in str(leaf.dtype):
            # PRNG keys: store raw key data.
            arrays[f"key_{i}"] = np.asarray(jax.random.key_data(leaf))
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    if filt is not None:
        arrays["settings_hash"] = np.bytes_(settings_fingerprint(filt).encode())
    np.savez_compressed(path, n_leaves=np.int64(len(leaves)), **arrays)


def load_state(path: str, template: Any, filt: Any | None = None) -> Any:
    """Restore a snapshot into the structure of `template` (a freshly
    init()-ed state for the SAME filter configuration).  If both the
    snapshot and this call carry a filter fingerprint, they must match."""
    data = np.load(path)
    if filt is not None and "settings_hash" in data:
        want = settings_fingerprint(filt)
        got = bytes(data["settings_hash"]).decode()
        if got != want:
            raise ValueError(
                f"snapshot was taken under a different filter configuration "
                f"(fingerprint {got} != {want}); refusing to resume"
            )
    leaves_t, treedef = jax.tree.flatten(template)
    n = int(data["n_leaves"])
    if n != len(leaves_t):
        raise ValueError(
            f"snapshot has {n} leaves, filter state expects {len(leaves_t)} "
            "(was the filter configuration changed?)"
        )
    leaves = []
    for i, tmpl in enumerate(leaves_t):
        if f"key_{i}" in data:
            leaf = jax.random.wrap_key_data(jnp.asarray(data[f"key_{i}"]))
        else:
            arr = data[f"leaf_{i}"]
            if arr.shape != tuple(jnp.shape(tmpl)):
                raise ValueError(
                    f"leaf {i}: snapshot shape {arr.shape} != state shape "
                    f"{jnp.shape(tmpl)}"
                )
            leaf = jnp.asarray(arr)
        leaves.append(leaf)
    return jax.tree.unflatten(treedef, leaves)

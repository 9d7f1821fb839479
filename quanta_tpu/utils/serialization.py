"""Persistence of quantized tensors and whole parameter trees.

Behavior contract from the reference: a quantized artifact is packed codes
+ scales/zero-points + metadata {bits, scheme, type, shape, dtype}, and it
round-trips (`/root/reference/Quanta/utils/utils.py:60-210`). Two formats:

- ``.qtn``: the reference's custom binary container (:60-165) — 8-byte
  little-endian header length, JSON metadata, then raw payload bytes.
  Unlike the reference loader (:159-163, which assumes a single scalar f32
  scale and silently truncates per-channel scales — SURVEY.md §2.7 defect 3),
  the metadata here records the full shape/dtype of every payload array, so
  per-block scale vectors round-trip exactly.
- ``.npz``: numpy-native container for single tensors and for whole
  parameter trees (the torch.save-dict analog of :167-210 and the
  checkpoint format for model surgery). Trees may mix QuantizedTensor and
  plain-array leaves; leaf paths are '/'-joined keys.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu.core import QuantizedTensor

_MAGIC = b"QTN1"


def _meta(qt: QuantizedTensor) -> Dict[str, Any]:
    m = {
        "bits": qt.bits,
        "scheme": qt.scheme,
        "codebook": qt.codebook,
        "shape": list(qt.shape),
        "dtype": str(jnp.dtype(qt.dtype)),
        "block_size": qt.block_size,
        "packed": qt.packed,
        "codes_dtype": str(np.asarray(qt.codes).dtype),
        "codes_shape": list(qt.codes.shape),
        "scale_dtype": str(np.asarray(qt.scale).dtype),
        "scale_shape": list(qt.scale.shape),
        "has_zp": qt.zero_point is not None,
    }
    if qt.zero_point is not None:
        m["zp_dtype"] = str(np.asarray(qt.zero_point).dtype)
        m["zp_shape"] = list(qt.zero_point.shape)
    return m


def _from_meta(m: Dict[str, Any], codes, scale, zp) -> QuantizedTensor:
    return QuantizedTensor(
        codes=jnp.asarray(codes),
        scale=jnp.asarray(scale),
        zero_point=None if zp is None else jnp.asarray(zp),
        bits=m["bits"],
        scheme=m["scheme"],
        codebook=m["codebook"],
        shape=tuple(m["shape"]),
        dtype=jnp.dtype(m["dtype"]),
        block_size=m["block_size"],
        packed=m["packed"],
    )


# ------------------------------------------------------------------- .qtn


def save_qtn(qt: QuantizedTensor, path: str) -> None:
    meta = json.dumps(_meta(qt)).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(meta).to_bytes(8, "little"))
        f.write(meta)
        f.write(np.ascontiguousarray(np.asarray(qt.codes)).tobytes())
        f.write(np.ascontiguousarray(np.asarray(qt.scale)).tobytes())
        if qt.zero_point is not None:
            f.write(np.ascontiguousarray(np.asarray(qt.zero_point)).tobytes())


def load_qtn(path: str) -> QuantizedTensor:
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError(f"{path}: not a .qtn file")
        n = int.from_bytes(f.read(8), "little")
        m = json.loads(f.read(n))
        def read_array(shape, dtype_name):
            # np.prod([]) == 1.0 already covers scalars; zero-size arrays
            # read zero bytes and reshape cleanly.
            dt = np.dtype(jnp.dtype(dtype_name).name)
            count = int(np.prod(shape))
            return np.frombuffer(f.read(count * dt.itemsize), dtype=dt).reshape(
                shape
            )

        codes = read_array(m["codes_shape"], m["codes_dtype"])
        scale = read_array(m["scale_shape"], m.get("scale_dtype", "float32"))
        zp = None
        if m["has_zp"]:
            zp = read_array(m["zp_shape"], m["zp_dtype"])
    return _from_meta(m, codes, scale, zp)


# ------------------------------------------------------------------- .npz


def save_npz(qt: QuantizedTensor, path: str) -> None:
    arrays = {"codes": np.asarray(qt.codes), "scale": np.asarray(qt.scale)}
    if qt.zero_point is not None:
        arrays["zero_point"] = np.asarray(qt.zero_point)
    np.savez(path, __meta__=json.dumps(_meta(qt)), **arrays)


def load_npz(path: str) -> QuantizedTensor:
    with np.load(path, allow_pickle=False) as z:
        m = json.loads(str(z["__meta__"]))
        return _from_meta(
            m, z["codes"], z["scale"], z["zero_point"] if m["has_zp"] else None
        )


def save_quantized_tensor(qt: QuantizedTensor, path: str) -> None:
    """Extension-dispatched save (reference state.py:157-160)."""
    if path.endswith(".qtn"):
        save_qtn(qt, path)
    elif path.endswith(".npz"):
        save_npz(qt, path)
    else:
        raise ValueError(f"unsupported extension: {path} (use .qtn or .npz)")


def load_quantized_tensor(path: str) -> QuantizedTensor:
    if path.endswith(".qtn"):
        return load_qtn(path)
    if path.endswith(".npz"):
        return load_npz(path)
    raise ValueError(f"unsupported extension: {path} (use .qtn or .npz)")


# -------------------------------------------------------- tree checkpoints


def _flatten_tree(tree):
    """Flatten to ``{path: leaf}`` plus ``{path: container_kind}``.

    The container-kind map records, for every internal node (including the
    root at path ``""`` and *empty* containers), whether it was a dict,
    list, or tuple — so rebuilding never has to guess from key shapes."""
    flat: Dict[str, Any] = {}
    kinds: Dict[str, str] = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            kinds[prefix] = "dict"
            for k, v in node.items():
                k = str(k)
                if "/" in k:
                    raise ValueError(f"tree key may not contain '/': {k!r}")
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            kinds[prefix] = "list" if isinstance(node, list) else "tuple"
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}" if prefix else str(i), v)
        else:
            flat[prefix] = node

    walk("", tree)
    return flat, kinds


def _put_array(arrays: Dict[str, np.ndarray], key: str, a) -> Dict[str, Any]:
    """Store one array under ``key``; returns per-array metadata (bf16 is
    stored as its uint16 bits since numpy npz can't hold bfloat16)."""
    a = np.asarray(a)
    entry: Dict[str, Any] = {}
    if a.dtype == jnp.bfloat16:
        entry["view_dtype"] = "bfloat16"
        a = a.view(np.uint16)
    arrays[key] = a
    return entry


def _get_array(z, key: str, entry: Dict[str, Any]):
    a = jnp.asarray(z[key])
    if entry.get("view_dtype"):
        a = a.view(entry["view_dtype"])
    return a


def _save_leaf(name: str, leaf, arrays: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Serialize one leaf (recursing into wrapper weights); returns its
    JSON-able metadata entry. Raises TypeError on unsupported leaf types
    instead of silently pickling them (which load, with allow_pickle=False,
    could never read back)."""
    from quanta_tpu import calib
    from quanta_tpu.nn.lora import LoRAWeight
    from quanta_tpu.ops.int4c import Int4cWeight
    from quanta_tpu.ops.int8mm import Int8Weight

    if isinstance(leaf, QuantizedTensor):
        entry: Dict[str, Any] = {"kind": "qtensor", **_meta(leaf)}
        arrays[f"{name}.codes"] = np.asarray(leaf.codes)
        arrays[f"{name}.scale"] = np.asarray(leaf.scale)
        if leaf.zero_point is not None:
            arrays[f"{name}.zp"] = np.asarray(leaf.zero_point)
        return entry
    if isinstance(leaf, Int8Weight):
        entry = {
            "kind": "int8weight",
            "threshold": leaf.threshold,
            "shape": list(leaf.shape),
        }
        for field in ("codes", "scale", "outlier_idx", "w_outlier"):
            entry[field] = _put_array(
                arrays, f"{name}.{field}", getattr(leaf, field)
            )
        return entry
    if isinstance(leaf, Int4cWeight):
        entry = {"kind": "int4cweight", "shape": list(leaf.shape)}
        for field in ("codes", "scale"):
            entry[field] = _put_array(
                arrays, f"{name}.{field}", getattr(leaf, field)
            )
        return entry
    if isinstance(leaf, LoRAWeight):
        entry = {
            "kind": "lora",
            "alpha": leaf.alpha,
            "base": _save_leaf(f"{name}.base", leaf.base, arrays),
        }
        entry["lora_a"] = _put_array(arrays, f"{name}.lora_a", leaf.lora_a)
        entry["lora_b"] = _put_array(arrays, f"{name}.lora_b", leaf.lora_b)
        return entry
    if isinstance(leaf, calib.ActQuantWeight):
        entry = {
            "kind": "actquant",
            "bits": leaf.bits,
            "w": _save_leaf(f"{name}.w", leaf.w, arrays),
        }
        entry["lo"] = _put_array(arrays, f"{name}.lo", leaf.lo)
        entry["hi"] = _put_array(arrays, f"{name}.hi", leaf.hi)
        return entry
    if isinstance(leaf, calib.TapWeight):
        # taps are a calibration-time instrumentation detail, not state
        entry = _save_leaf(name, leaf.w, arrays)
        return entry
    if isinstance(leaf, (jax.Array, np.ndarray)) or np.isscalar(leaf):
        entry = {"kind": "array"}
        entry.update(_put_array(arrays, f"{name}.a", leaf))
        return entry
    raise TypeError(
        f"checkpoint leaf {name!r} has unsupported type "
        f"{type(leaf).__name__}; supported: array, QuantizedTensor, "
        "Int8Weight, Int4cWeight, LoRAWeight, ActQuantWeight, TapWeight"
    )


def _load_leaf(name: str, m: Dict[str, Any], z):
    from quanta_tpu import calib
    from quanta_tpu.nn.lora import LoRAWeight
    from quanta_tpu.ops.int4c import Int4cWeight
    from quanta_tpu.ops.int8mm import Int8Weight

    kind = m["kind"]
    if kind == "qtensor":
        return _from_meta(
            m,
            z[f"{name}.codes"],
            z[f"{name}.scale"],
            z[f"{name}.zp"] if m["has_zp"] else None,
        )
    if kind == "int8weight":
        return Int8Weight(
            codes=_get_array(z, f"{name}.codes", m["codes"]),
            scale=_get_array(z, f"{name}.scale", m["scale"]),
            outlier_idx=_get_array(z, f"{name}.outlier_idx", m["outlier_idx"]),
            w_outlier=_get_array(z, f"{name}.w_outlier", m["w_outlier"]),
            threshold=m["threshold"],
            shape=tuple(m["shape"]),
        )
    if kind == "int4cweight":
        return Int4cWeight(
            codes=_get_array(z, f"{name}.codes", m["codes"]),
            scale=_get_array(z, f"{name}.scale", m["scale"]),
            shape=tuple(m["shape"]),
        )
    if kind == "lora":
        return LoRAWeight(
            base=_load_leaf(f"{name}.base", m["base"], z),
            lora_a=_get_array(z, f"{name}.lora_a", m["lora_a"]),
            lora_b=_get_array(z, f"{name}.lora_b", m["lora_b"]),
            alpha=m["alpha"],
        )
    if kind == "actquant":
        return calib.ActQuantWeight(
            w=_load_leaf(f"{name}.w", m["w"], z),
            lo=_get_array(z, f"{name}.lo", m["lo"]),
            hi=_get_array(z, f"{name}.hi", m["hi"]),
            bits=m["bits"],
        )
    return _get_array(z, f"{name}.a", m)


def save_checkpoint(tree, path: str) -> None:
    """Save a (possibly quantized) parameter tree to one .npz file.

    Quantized leaves (QuantizedTensor / Int8Weight / LoRAWeight /
    ActQuantWeight) store their component arrays plus JSON metadata; plain
    jax/numpy array leaves store as-is. Container kinds (dict vs list vs
    tuple) are recorded per path in the ``__tree__`` metadata so the
    structure round-trips exactly — including dicts whose keys happen
    to be '0'..'n-1' and empty containers. This is the framework's
    checkpoint format: packed uint8 weights + per-block scales + a JSON
    quant-state tree (SURVEY.md §5 checkpoint contract)."""
    flat, kinds = _flatten_tree(tree)
    arrays: Dict[str, np.ndarray] = {}
    leaves: Dict[str, Any] = {}
    for name, leaf in flat.items():
        leaves[name] = _save_leaf(name, leaf, arrays)
    meta = {"version": 3, "leaves": leaves, "containers": kinds}
    np.savez(path, __tree__=json.dumps(meta), **arrays)


def load_checkpoint(path: str):
    """Load a checkpoint back into its original nested structure."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__tree__"]))
        leaves_meta = meta["leaves"]
        kinds = meta["containers"]
        flat: Dict[str, Any] = {}
        for name, m in leaves_meta.items():
            flat[name] = _load_leaf(name, m, z)

    if "" in flat:  # the tree was a bare leaf
        return flat[""]

    # Build a dict skeleton from leaf paths + (possibly empty) containers.
    nested: Dict[str, Any] = {}
    for cpath in kinds:
        node = nested
        if cpath:
            for p in cpath.split("/"):
                node = node.setdefault(p, {})
    for name, leaf in flat.items():
        node = nested
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    # Convert skeleton dicts to their recorded container kinds, bottom-up.
    def convert(node, path):
        if not isinstance(node, dict):
            return node
        out = {
            k: convert(v, f"{path}/{k}" if path else k) for k, v in node.items()
        }
        kind = kinds.get(path, "dict")
        if kind in ("list", "tuple"):
            seq = [out[str(i)] for i in range(len(out))]
            return tuple(seq) if kind == "tuple" else seq
        return out

    return convert(nested, "")


def checkpoint_nbytes(path: str) -> int:
    return os.path.getsize(path)

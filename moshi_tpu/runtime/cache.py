"""Quantized-model disk cache — the reference's GGUF-cache analog.

The reference quantizes once (minutes) and snapshots the quantized model
to GGUF so reloads take seconds (README.md:53, 319-325; loader.h:227-271;
moshi.cpp:693-695).  Here the quantized param tree is serialized to a
single safetensors file: each pytree leaf keyed by its tree path, with
QuantTensor leaves exploded into their packed fields
(``path#fmt:field``) and non-tensor metadata in the safetensors header.
Loading memory-maps and rebuilds the exact tree — no re-quantization.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.io.safetensors import SafeTensors, save_safetensors
from moshi_tpu.quant.formats import QuantTensor

_QT_FIELDS = ("q", "d", "sc", "mn", "dmin", "es", "em")


def _path_str(path) -> str:
    parts = []
    for p in path:
        s = str(p)
        parts.append(s.replace("['", "").replace("']", "").replace("[", "")
                     .replace("]", ""))
    return "/".join(parts)


def save_quantized(path: str, params, metadata: Dict[str, str] | None = None):
    leaves = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, QuantTensor))[0]
    tensors: Dict[str, Any] = {}
    qt_meta: Dict[str, Any] = {}
    for p, leaf in leaves:
        key = _path_str(p)
        if isinstance(leaf, QuantTensor):
            qt_meta[key] = {"fmt": leaf.fmt, "shape": list(leaf.shape)}
            for f in _QT_FIELDS:
                arr = getattr(leaf, f)
                if arr is not None:
                    a = np.asarray(arr)
                    tensors[f"{key}#{f}"] = a
        else:
            a = np.asarray(leaf)
            if a.dtype == jnp.bfloat16:
                from moshi_tpu.io.safetensors import f32_to_bf16_raw
                tensors[key] = (f32_to_bf16_raw(a.astype(np.float32)), "BF16")
            else:
                tensors[key] = a
    meta = dict(metadata or {})
    meta["moshi_tpu.quant"] = json.dumps(qt_meta)
    save_safetensors(path, tensors, metadata=meta)


def load_quantized(path: str, dtype=None):
    """Rebuild the nested dict param tree from a cache file."""
    st = SafeTensors(path)
    qt_meta = json.loads(st._meta.get("moshi_tpu.quant", "{}"))
    tree: Dict[str, Any] = {}

    def insert(root, key_path, value):
        parts = key_path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    qt_fields: Dict[str, Dict[str, np.ndarray]] = {}
    for name in list(st.keys()):
        if "#" in name:
            base, field = name.rsplit("#", 1)
            arr = jnp.asarray(st[name])
            if st.dtype(name) == "BF16":
                arr = arr.astype(jnp.bfloat16)
            qt_fields.setdefault(base, {})[field] = arr
        else:
            arr = jnp.asarray(st[name])
            if st.dtype(name) == "BF16":
                arr = arr.astype(jnp.bfloat16)
            insert(tree, name, arr)
    for base, fields in qt_fields.items():
        info = qt_meta[base]
        def get(f):
            a = fields.get(f)
            if a is None:
                return None
            # f16 fields round-trip via uint16 view
            return jnp.asarray(a)
        qt = QuantTensor(info["fmt"], tuple(info["shape"]),
                         get("q"), get("d"), get("sc"), get("mn"),
                         get("dmin"), get("es"), get("em"))
        insert(tree, base, qt)
    st.close()
    # restore integer-keyed lists?  all our trees are pure dicts — done.
    return tree

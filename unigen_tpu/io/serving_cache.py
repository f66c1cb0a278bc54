"""Quantized serving-tree persistence (production cold-start path).

``load_flux_pipeline(quantize="w4a8")`` reads the bf16 checkpoint (~33 GiB
for the real 12B FLUX + 4.7B adapter) and walks the streaming quantizer —
minutes of IO + quantization on every serving restart. This module persists
the RESULT (the 9.4 GiB quantized pytree of int8 carriers + scales + the
bf16 leaves the policy leaves untouched) so a restart reads the small tree
directly and skips quantization entirely.

No reference counterpart (the reference serves bf16 torch and reloads the
HF checkpoint each start); beyond-parity serving infrastructure.

Layout::

  {dir}/
    tree/        orbax PyTreeCheckpointer payload (host numpy leaves)
    meta.json    {"format": "unigen-serving-tree", "quantize": ...,
                  "config": <caller fingerprint>}

The meta ``config`` fingerprint is validated on load — a cache written for
a different topology or quantization policy refuses to load rather than
producing silently wrong weights.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

FORMAT = "unigen-serving-tree"


def save_serving_tree(tree, path: str, *, quantize: str,
                      config_fingerprint: Optional[Dict[str, Any]] = None
                      ) -> str:
    """Persist a (quantized) serving pytree. Leaves are pulled to host one
    at a time (axon d2h is safe leaf-wise under the residency ceiling) and
    written via orbax."""
    import orbax.checkpoint as ocp
    host = jax.tree.map(np.asarray, tree)
    os.makedirs(path, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "tree"), host, force=True)
    meta = {"format": FORMAT, "quantize": quantize,
            "config": config_fingerprint or {}}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def has_serving_tree(path: Optional[str]) -> bool:
    return bool(path) and os.path.exists(os.path.join(path, "meta.json"))


def load_serving_tree(path: str, *, quantize: str,
                      config_fingerprint: Optional[Dict[str, Any]] = None
                      ) -> Tuple[Any, Dict[str, Any]]:
    """Restore a serving tree saved by :func:`save_serving_tree`. Validates
    the format, quantization mode, and config fingerprint; leaves land on
    device leaf-wise (bounded HBM growth during the transfer)."""
    import orbax.checkpoint as ocp
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") != FORMAT:
        raise ValueError(f"{path}: not a serving-tree cache "
                         f"(format={meta.get('format')!r})")
    if meta.get("quantize") != quantize:
        raise ValueError(
            f"{path}: cache was quantized as {meta.get('quantize')!r}, "
            f"caller wants {quantize!r} — refusing to load; delete the "
            "cache dir or change the policy")
    want = config_fingerprint or {}
    got = meta.get("config", {})
    mismatched = {k: (got.get(k), v) for k, v in want.items()
                  if got.get(k) != v}
    if mismatched:
        raise ValueError(
            f"{path}: cache topology mismatch {mismatched} — the cache was "
            "written for a different model config; delete it or point "
            "serving_cache elsewhere")
    with ocp.PyTreeCheckpointer() as ckptr:
        host = ckptr.restore(os.path.join(path, "tree"))
    return jax.tree.map(jax.device_put, host), meta

"""Int8 weight compression for serving artifacts (post-training, symmetric).

Beyond-reference serving capability.  The reference shipped full float32
`tf.train.Saver` checkpoints to deployment (SURVEY.md §3.4/§5.4); production
TPU serving wants artifacts small enough to push through a deploy pipeline
and cold-start fast.  This module shrinks the params blob ~4x with
per-output-channel symmetric int8 quantization:

    q   = round(w / scale)   in [-127, 127], int8
    w'  = q * scale          (dequantized at artifact LOAD time, float32)

* Only matrix-shaped weights are quantized (float32, ndim >= 2 and
  size >= ``min_size``): dense/conv kernels, the DFT bases, centroid tables.
  Biases, norm gains, PReLU alphas and other small/1-D leaves pass through
  untouched — they are a rounding hazard and a negligible share of the bytes.
* ``scale`` is per-OUTPUT-channel (the trailing axis: every kernel here is
  stored [..., in, out] or [taps, channels]), so one outlier column cannot
  crush the resolution of the rest.
* Compute is untouched: the AOT-exported StableHLO programs still take
  float32 params; dequantization happens once on the serving host when the
  artifact is opened (infer/export.py reads ``params_quantize`` from
  export_meta.json).  The only numerical difference vs an f32 artifact is
  the one-time weight rounding — measured on the committed trained flagship
  in PARITY.md ("int8 serving artifacts" row).

The encoding is a plain state-dict transform: a quantized leaf becomes a
``{"q8:data": int8[..., C], "q8:scale": float32[C]}`` sub-dict, which flax
msgpack serializes as-is.  Parameter names are alphanumeric, so the marker
keys cannot collide with a real subtree.
"""

from __future__ import annotations

import numpy as np

_DATA = "q8:data"
_SCALE = "q8:scale"

#: quantize float32 leaves with at least this many elements (and ndim >= 2)
MIN_SIZE = 1024


def _is_q8(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {_DATA, _SCALE}


def _eligible(a, min_size: int) -> bool:
    return (
        isinstance(a, np.ndarray)
        and a.dtype == np.float32
        and a.ndim >= 2
        and a.size >= min_size
    )


def quantize_leaf(a: np.ndarray) -> dict:
    """float32 [..., C] -> {"q8:data": int8 [..., C], "q8:scale": f32 [C]}."""
    amax = np.max(np.abs(a), axis=tuple(range(a.ndim - 1)))
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(a / scale), -127, 127).astype(np.int8)
    return {_DATA: q, _SCALE: scale}


def dequantize_leaf(node: dict) -> np.ndarray:
    return (node[_DATA].astype(np.float32) * node[_SCALE]).astype(np.float32)


def quantize_state_dict(sd, min_size: int = MIN_SIZE):
    """Walk a flax state dict (nested plain dicts, ndarray leaves) and replace
    every eligible weight with its int8 encoding.  Pure; returns a new tree."""
    if isinstance(sd, dict):
        return {k: quantize_state_dict(v, min_size) for k, v in sd.items()}
    a = np.asarray(sd)
    return quantize_leaf(a) if _eligible(a, min_size) else sd


def dequantize_state_dict(sd):
    """Inverse of quantize_state_dict (up to the int8 rounding)."""
    if _is_q8(sd):
        return dequantize_leaf(sd)
    if isinstance(sd, dict):
        return {k: dequantize_state_dict(v) for k, v in sd.items()}
    return sd


def quantized_fraction(sd) -> float:
    """Fraction of parameter bytes ELIMINATED by the encoding (diagnostic,
    recorded in export_meta.json): 1 - encoded_bytes / float32_bytes."""

    def walk(node):
        if _is_q8(node):
            n = node[_DATA].size
            return 4 * n, n + 4 * node[_SCALE].size
        if isinstance(node, dict):
            tot, enc = 0, 0
            for v in node.values():
                t, e = walk(v)
                tot, enc = tot + t, enc + e
            return tot, enc
        a = np.asarray(node)
        return a.nbytes, a.nbytes

    total_f32, encoded = walk(sd)
    return 0.0 if total_f32 == 0 else 1.0 - encoded / total_f32

"""AOT serving export: deploy separation without model code or tracing.

Beyond-reference capability.  The reference deployed by re-running its model-
building Python and restoring a tf.train.Saver checkpoint into the rebuilt
graph (SURVEY.md §3.4) — serving required the full training codebase.  A
production TPU serving stack should not: here the jitted serving function is
lowered ONCE to StableHLO via ``jax.export`` and serialized to disk next to a
params-only blob, and any process with jax on a matching platform can run it —
no model classes, no config reconstruction, no Python tracing, no recompiles
beyond XLA's fast StableHLO->executable step.  Artifacts are exported for
BOTH cpu and tpu lowering platforms by default, so the same directory serves
on a dev host and on the chip.

Artifact directory layout (``export_serving``):

    export_meta.json      format/version, serving shapes, front config (for
                          frame-mask construction), n_speakers, provenance
    params.msgpack        params-only pytree (flax msgpack, host arrays)
    serving_t{T}_b{B}.jaxexp
                          serialized jax.export.Exported per (length, batch)
                          bucket: fn(params, mix[B,T], frame_mask[B,T']) ->
                          est[B,S,T]

``ServingArtifact`` mirrors the bucketed batch-serving semantics of
infer/streaming.py::StreamingSeparator (same padding + frame-mask convention,
same RTF meter) so evaluation numbers carry over exactly; parity is pinned by
tests/test_export.py, including a subprocess that separates through the
artifact without importing any amss_tpu model module.
"""

from __future__ import annotations

import json
import os

import numpy as np

_FORMAT_VERSION = 1


def _host(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _write_params(out_dir: str, host_params, quantize: str | None) -> dict:
    """Write params.msgpack (optionally int8-compressed) and return the meta
    fields describing how it was stored."""
    import flax.serialization as fser

    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize={quantize!r} (int8 or None)")
    blob, extra = host_params, {}
    if quantize == "int8":
        from amss_tpu.infer.quantize import (
            quantize_state_dict,
            quantized_fraction,
        )

        blob = quantize_state_dict(host_params)
        extra = {
            "params_quantize": "int8",
            "params_bytes_saved_frac": round(quantized_fraction(blob), 4),
        }
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(fser.to_bytes(blob))
    return extra


def _restore_params(path: str, meta: dict):
    """Read params.msgpack back to the float32 state dict the exported
    programs expect, dequantizing if the artifact was int8-compressed."""
    import flax.serialization as fser

    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = fser.msgpack_restore(f.read())
    if meta.get("params_quantize") == "int8":
        from amss_tpu.infer.quantize import dequantize_state_dict

        params = dequantize_state_dict(params)
    return params


def export_serving(
    model,
    params,
    out_dir: str,
    *,
    lengths: tuple[int, ...] = (16384, 65536),
    batch: int = 8,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    sample_rate: int = 8000,
    recipe_dict: dict | None = None,
    separate_kwargs: dict | None = None,
    quantize: str | None = None,
) -> str:
    """Lower ``model.separate`` to StableHLO for each (length, batch) bucket
    and write a self-contained serving directory.  Returns ``out_dir``.

    ``model.separate`` must accept (params, mix [B,T], frame_mask [B,T']) —
    the StreamingSeparator contract.  Params stay function INPUTS (stored
    once in params.msgpack), so the .jaxexp files hold only the program.
    ``quantize="int8"`` stores the params blob int8-compressed (~4x smaller;
    infer/quantize.py) — the programs are unchanged, the loader dequantizes.
    """
    import dataclasses

    import flax.serialization as fser
    import jax
    from jax import export as jexport

    kw = separate_kwargs or {}

    # The exported function takes params in flax STATE-DICT form (dicts all
    # the way down — lists become {"0": ...}): msgpack roundtrips that form
    # losslessly, whereas the live pytree's list nodes (e.g. tcn "blocks")
    # would deserialize with a different tree structure and be rejected by
    # Exported.call.  from_state_dict only restructures (leaves pass through),
    # so it traces cleanly inside the exported program.
    def run(p_state, mix, frame_mask):
        p = fser.from_state_dict(params, p_state)
        return model.separate(p, mix, frame_mask=frame_mask, **kw)

    os.makedirs(out_dir, exist_ok=True)
    host_params = fser.to_state_dict(_host(params))
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_params
    )
    front = model.cfg.front
    buckets = []
    for t in sorted(set(int(x) for x in lengths)):
        nf = front.frames_for(t)
        exp = jexport.export(jax.jit(run), platforms=tuple(platforms))(
            sds,
            jax.ShapeDtypeStruct((batch, t), np.float32),
            jax.ShapeDtypeStruct((batch, nf), np.float32),
        )
        fname = f"serving_t{t}_b{batch}.jaxexp"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        buckets.append({"length": t, "frames": nf, "file": fname})

    q_meta = _write_params(out_dir, host_params, quantize)

    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": "offline",
        **q_meta,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch": int(batch),
        "n_speakers": int(model.cfg.nb_speakers),
        "sample_rate": int(sample_rate),
        "front": dataclasses.asdict(front),
        "buckets": buckets,
        "recipe": recipe_dict,
    }
    with open(os.path.join(out_dir, "export_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def export_realtime(
    model,
    params,
    out_dir: str,
    *,
    chunk_samples: int = 4096,
    n_streams: int = 1,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    sample_rate: int = 8000,
    long_stream: bool = False,
    recipe_dict: dict | None = None,
    quantize: str | None = None,
) -> str:
    """AOT-export the causal low-latency streaming path (infer/realtime.py):
    TWO StableHLO programs — ``init() -> stream state`` (zeros built in-graph,
    so the artifact stays small) and ``step(params, state, chunk, end_frame)
    -> (separated block, state')`` — plus the shared params blob.  A serving
    host runs the full device-resident streaming loop with no model code
    (RealtimeArtifact)."""
    import dataclasses

    import flax.serialization as fser
    import jax
    from jax import export as jexport

    from amss_tpu.infer.realtime import RealtimeSeparator

    rt = RealtimeSeparator(
        model, params, chunk_samples=chunk_samples, n_streams=n_streams,
        sample_rate=sample_rate, long_stream=long_stream,
    )
    step = rt._make_step()
    state0 = rt._init_state()
    frame_base0 = int(np.asarray(state0["frame_base"]))

    def init_fn():
        import jax.numpy as jnp

        z = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, x.dtype), state0
        )
        z["frame_base"] = jnp.asarray(frame_base0, jnp.int32)
        return z

    def run(p_state, state, chunk, end_frame):
        p = fser.from_state_dict(params, p_state)
        return step(p, state, chunk, end_frame)

    os.makedirs(out_dir, exist_ok=True)
    host_params = fser.to_state_dict(_host(params))
    sds = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), tree
    )
    exp_init = jexport.export(jax.jit(init_fn), platforms=tuple(platforms))()
    exp_step = jexport.export(jax.jit(run), platforms=tuple(platforms))(
        sds(host_params),
        sds(_host(state0)),
        jax.ShapeDtypeStruct((n_streams, chunk_samples), np.float32),
        jax.ShapeDtypeStruct((n_streams,), np.int32),
    )
    with open(os.path.join(out_dir, "realtime_init.jaxexp"), "wb") as f:
        f.write(exp_init.serialize())
    step_name = f"realtime_step_c{chunk_samples}_b{n_streams}.jaxexp"
    with open(os.path.join(out_dir, step_name), "wb") as f:
        f.write(exp_step.serialize())
    q_meta = _write_params(out_dir, host_params, quantize)

    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": "realtime",
        **q_meta,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "chunk_samples": int(chunk_samples),
        "n_streams": int(n_streams),
        "lag": int(rt.lag),
        "n_speakers": int(model.cfg.nb_speakers),
        "sample_rate": int(sample_rate),
        "long_stream": bool(long_stream),
        "front": dataclasses.asdict(model.cfg.front),
        "files": {"init": "realtime_init.jaxexp", "step": step_name},
        "recipe": recipe_dict,
    }
    with open(os.path.join(out_dir, "export_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ServingArtifact:
    """Run an exported serving directory — no model code, no tracing.

    Usage::

        art = ServingArtifact("/path/to/export")
        outs = art.separate_all(list_of_waves)   # list of [S, T_orig]

    Bucketing, zero-padding, and frame-mask semantics match
    StreamingSeparator exactly (tested); groups are padded up to the exported
    static batch with zero rows (AOT programs have fixed shapes).
    """

    def __init__(self, path: str):
        from amss_tpu.infer.streaming import RTFMeter
        from amss_tpu.utils.config import FrontConfig

        self.path = path
        with open(os.path.join(path, "export_meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"serving artifact at {path} has format_version "
                f"{self.meta['format_version']}; this loader reads "
                f"{_FORMAT_VERSION}"
            )
        if self.meta.get("kind", "offline") != "offline":
            raise ValueError(
                f"artifact at {path} is kind={self.meta['kind']!r}; use "
                "RealtimeArtifact for realtime exports"
            )
        self.params = _restore_params(path, self.meta)
        self.front = FrontConfig(**self.meta["front"])
        self.batch = self.meta["batch"]
        self.n_speakers = self.meta["n_speakers"]
        self.sample_rate = self.meta["sample_rate"]
        self.buckets = sorted(self.meta["buckets"], key=lambda b: b["length"])
        self._fns: dict[int, object] = {}  # length -> Exported (lazy)
        self.meter = RTFMeter()

    def _bucket_for(self, n: int) -> dict:
        for b in self.buckets:
            if n <= b["length"]:
                return b
        raise ValueError(
            f"utterance of {n} samples exceeds the largest exported bucket "
            f"({self.buckets[-1]['length']}) — exact-shape APIs don't chunk; "
            "separate_all/separate_long handle over-bucket audio"
        )

    def _exported(self, bucket: dict):
        """Deserialize + warm a bucket's program on zeros at first use, so
        XLA's StableHLO->executable compile books as compile_seconds and the
        RTF meter sees steady-state serving only (StreamingSeparator's
        convention)."""
        import time

        from jax import export as jexport

        t = bucket["length"]
        if t not in self._fns:
            with open(os.path.join(self.path, bucket["file"]), "rb") as f:
                exp = jexport.deserialize(f.read())
            t0 = time.perf_counter()
            out = exp.call(
                self.params,
                np.zeros((self.batch, t), np.float32),
                np.ones((self.batch, bucket["frames"]), np.float32),
            )
            np.asarray(out[0, 0, :4])  # host fetch = real sync through axon
            self.meter.compile_seconds += time.perf_counter() - t0
            self._fns[t] = exp
        return self._fns[t]

    def separate_batch(self, mix: np.ndarray, n_valid: np.ndarray | None = None):
        """Separate one exact-shape batch [B, T] (T must be an exported
        bucket, B the exported batch).  ``n_valid[j]`` = true sample count of
        row j (for the frame mask); defaults to full length."""
        b, t = mix.shape
        bucket = self._bucket_for(t)
        if t != bucket["length"] or b != self.batch:
            raise ValueError(
                f"exact-shape API: got {mix.shape}, exported shape is "
                f"({self.batch}, {bucket['length']}) — use separate_all for "
                "ragged inputs"
            )
        fmask = np.zeros((b, bucket["frames"]), np.float32)
        for j in range(b):
            nv = int(n_valid[j]) if n_valid is not None else t
            fmask[j, : self.front.frames_for(nv)] = 1.0
        exp = self._exported(bucket)
        return np.asarray(
            exp.call(self.params, mix.astype(np.float32), fmask)
        )

    def separate_all(self, waves: list[np.ndarray]) -> list[np.ndarray]:
        """Separate variable-length utterances; returns [S, T_orig] per input
        in order.  Mirrors StreamingSeparator.separate_all's bucketing;
        utterances beyond the largest bucket take the chunked overlap-discard
        path (separate_long) — never truncated."""
        import time

        results: list[np.ndarray | None] = [None] * len(waves)
        max_bucket = self.buckets[-1]["length"]
        for i, w in enumerate(waves):
            if len(w) > max_bucket:
                t0 = time.perf_counter()
                results[i] = self.separate_long(w)
                self.meter.compute_seconds += time.perf_counter() - t0
                self.meter.audio_seconds += len(w) / self.sample_rate
                self.meter.utterances += 1
        order = sorted(
            (i for i in range(len(waves)) if results[i] is None),
            key=lambda i: len(waves[i]),
        )
        group: list[int] = []
        current = None

        def flush(group):
            if not group:
                return
            bucket = self._bucket_for(max(len(waves[i]) for i in group))
            t = bucket["length"]
            mix = np.zeros((self.batch, t), np.float32)
            nv = np.zeros((self.batch,), np.int64)
            for j, i in enumerate(group):
                w = waves[i]
                mix[j, : len(w)] = w
                nv[j] = len(w)
            exp = self._exported(bucket)  # lazy deserialize before timing
            fmask = np.zeros((self.batch, bucket["frames"]), np.float32)
            for j in range(len(group)):
                fmask[j, : self.front.frames_for(int(nv[j]))] = 1.0
            t0 = time.perf_counter()
            est = np.asarray(exp.call(self.params, mix, fmask))
            self.meter.compute_seconds += time.perf_counter() - t0
            self.meter.calls += 1
            for j, i in enumerate(group):
                results[i] = est[j, :, : len(waves[i])]
                self.meter.audio_seconds += len(waves[i]) / self.sample_rate
                self.meter.utterances += 1

        for i in order:
            bkt = self._bucket_for(len(waves[i]))["length"]
            if group and (bkt != current or len(group) >= self.batch):
                flush(group)
                group = []
            current = bkt
            group.append(i)
        flush(group)
        return results  # type: ignore

    def separate_long(self, wave: np.ndarray, overlap: int = 4096) -> np.ndarray:
        """-> [S, len(wave)].  Arbitrary-length audio through the largest
        exported bucket: chunked overlap-discard with cross-chunk speaker
        alignment + crossfade (the same stitch as infer/long.py, so the
        artifact path and the live-model path agree)."""
        from amss_tpu.infer.long import stitch_chunks

        bucket = self.buckets[-1]
        chunk = bucket["length"]
        t = len(wave)
        if t <= chunk:
            return self.separate_all([wave])[0]
        overlap = min(overlap, chunk // 4)
        hop = chunk - overlap
        n_chunks = -(-max(t - overlap, 1) // hop)
        t_pad = (n_chunks - 1) * hop + chunk
        mix_p = np.zeros(t_pad, np.float32)
        mix_p[:t] = wave
        starts = [i * hop for i in range(n_chunks)]
        rows = np.stack([mix_p[s : s + chunk] for s in starts])

        exp = self._exported(bucket)
        fmask = np.ones((self.batch, bucket["frames"]), np.float32)
        # Dispatch all groups before fetching any: async dispatch overlaps
        # group k+1's transfer with group k's compute (same pipelining as
        # infer/long.py::separate_long).
        pending = []
        for g0 in range(0, n_chunks, self.batch):
            grp = rows[g0 : g0 + self.batch]
            n_real = grp.shape[0]
            if n_real < self.batch:
                grp = np.concatenate(
                    [grp, np.zeros((self.batch - n_real, chunk), np.float32)]
                )
            pending.append((exp.call(self.params, grp, fmask), n_real))
        est = np.concatenate([np.asarray(h)[:n] for h, n in pending])
        return stitch_chunks(est, starts, overlap, t, t_pad)


_NO_END = np.iinfo(np.int32).max


class RealtimeArtifact:
    """Run an exported causal-streaming directory — the deployment form of
    RealtimeSeparator, with identical push/stream semantics (exactness vs
    offline separation is inherited: the step program IS the traced
    RealtimeSeparator step).  No model code, no tracing.

    Usage::

        art = RealtimeArtifact(path)
        for chunk in stream:              # [B, chunk] or [chunk] when B == 1
            out = art.push(chunk)         # [B, S, chunk] (lags by art.lag)
        est = art.separate_stream(wave)   # whole-utterance convenience
    """

    def __init__(self, path: str):
        from jax import export as jexport

        from amss_tpu.utils.config import FrontConfig

        self.path = path
        with open(os.path.join(path, "export_meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("kind") != "realtime":
            raise ValueError(
                f"artifact at {path} is kind="
                f"{self.meta.get('kind', 'offline')!r}; use ServingArtifact"
            )
        if self.meta["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"format_version {self.meta['format_version']} != "
                f"{_FORMAT_VERSION}"
            )
        self.params = _restore_params(path, self.meta)
        files = self.meta["files"]
        with open(os.path.join(path, files["init"]), "rb") as f:
            self._init = jexport.deserialize(f.read())
        with open(os.path.join(path, files["step"]), "rb") as f:
            self._step = jexport.deserialize(f.read())
        self.front = FrontConfig(**self.meta["front"])
        self.c = self.meta["chunk_samples"]
        self.b = self.meta["n_streams"]
        self.lag = self.meta["lag"]
        self.n_speakers = self.meta["n_speakers"]
        self.sample_rate = self.meta["sample_rate"]
        self.state = self._init.call()

    def reset(self) -> None:
        """Zero the stream state (new utterances in every slot)."""
        self.state = self._init.call()

    def push(self, chunk: np.ndarray, end_frame=None) -> np.ndarray:
        """One streaming step: [B, c] (or [c] when B == 1) mixture samples ->
        [B, S, c] ([S, c]) separated samples, lagging the input by
        ``self.lag`` samples.  ``end_frame`` as in RealtimeSeparator.push."""
        chunk = np.asarray(chunk, np.float32)
        squeeze = self.b == 1 and chunk.ndim == 1
        if squeeze:
            chunk = chunk[None]
        if chunk.shape != (self.b, self.c):
            raise ValueError(
                f"push expects ({self.b}, {self.c}) "
                f"(or ({self.c},) when n_streams=1), got {chunk.shape}"
            )
        end = np.full((self.b,), _NO_END, np.int32) if end_frame is None else \
            np.broadcast_to(np.asarray(end_frame, np.int32), (self.b,))
        est, self.state = self._step.call(self.params, self.state, chunk, end)
        out = np.asarray(est)
        return out[0] if squeeze else out

    def separate_stream(self, wave: np.ndarray) -> np.ndarray:
        """Whole-utterance convenience (n_streams == 1): returns
        [S, len(wave)], exactly the model's offline separation."""
        if self.b != 1:
            raise ValueError("separate_stream serves one stream")
        self.reset()
        t = len(wave)
        n_chunks = -(-(t + self.lag) // self.c)
        nf = self.front.frames_for(t)
        padded = np.zeros(n_chunks * self.c, np.float32)
        padded[:t] = wave
        outs = [
            self.push(padded[i * self.c : (i + 1) * self.c], end_frame=nf)
            for i in range(n_chunks)
        ]
        full = np.concatenate(outs, axis=-1)
        return full[:, self.lag : self.lag + t]

    def separate_streams(self, waves) -> list[np.ndarray]:
        """Batched whole-utterance path for a multi-stream artifact: up to B
        (possibly ragged) waves, one per stream slot, per-stream end_frame —
        returns [S, len(wave)] per input.  Short groups leave the spare
        slots zero-padded."""
        if self.b == 1:
            return [self.separate_stream(w) for w in waves]
        if not 1 <= len(waves) <= self.b:
            raise ValueError(
                f"separate_streams takes 1..{self.b} waves "
                f"(n_streams={self.b}), got {len(waves)}"
            )
        self.reset()
        t = max(len(w) for w in waves)
        n_chunks = -(-(t + self.lag) // self.c)
        padded = np.zeros((self.b, n_chunks * self.c), np.float32)
        nf = np.zeros((self.b,), np.int32)
        for j, w in enumerate(waves):
            padded[j, : len(w)] = w
            nf[j] = self.front.frames_for(len(w))
        outs = [
            self.push(padded[:, i * self.c : (i + 1) * self.c], end_frame=nf)
            for i in range(n_chunks)
        ]
        full = np.concatenate(outs, axis=-1)  # [B, S, n*c]
        return [
            full[j, :, self.lag : self.lag + len(w)]
            for j, w in enumerate(waves)
        ]

"""Training engine: one pjit-sharded fit loop, recipes as configs.

Capability parity: the reference's per-recipe Trainer hierarchy + experiment
scripts (SURVEY.md §2.5, §3.1-3.3) collapsed into ONE engine — build step,
epoch loop, periodic validation, best-checkpoint retention — parameterized by
RecipeConfig.  TPU-first:

  * The whole step (device-side mixing -> front -> separator -> loss -> Adam)
    is one jit program; params/opt_state are donated so updates are in-place
    in HBM (no per-step reallocation).
  * Multi-chip: batches shard over the ``data`` mesh axis, params replicate;
    XLA emits the gradient psum over ICI.  The same code path runs single-chip
    with a 1-device mesh.
  * Front freezing for finetune warm-up (SURVEY.md §3.3) is a traced scalar
    gradient gate — no recompilation when it flips.
  * Deterministic resume: the Mixer is stateless in (seed, step, host), so restoring
    {params, opt_state, step} resumes bit-exact (SURVEY.md §5.3).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from amss_tpu.ckpt.checkpoint import (
    AsyncCheckpointer,
    restore_checkpoint,
    restore_subtree,
)
from amss_tpu.data.mixer import Mixer
from amss_tpu.models.adapt import AdaptAutoencoder
from amss_tpu.models.chimera import ChimeraModel
from amss_tpu.models.dpcl import DPCLModel
from amss_tpu.models.l41 import L41Model
from amss_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    stacked_batch_sharding,
)
from amss_tpu.utils.config import ModelConfig, RecipeConfig, run_id
from amss_tpu.utils.logging import MetricWriter


def make_model(cfg: ModelConfig, base_run: str | None = None):
    if cfg.kind == "dpcl":
        return DPCLModel(cfg)
    if cfg.kind == "l41":
        return L41Model(cfg)
    if cfg.kind == "chimera":
        return ChimeraModel(cfg)
    if cfg.kind == "tasnet":
        from amss_tpu.models.tasnet import TasNetModel

        return TasNetModel(cfg)
    if cfg.kind == "adapt_ae":
        return AdaptAutoencoder(cfg)
    if cfg.kind == "enhance":
        from amss_tpu.models.enhance import EnhancerModel

        if not base_run:
            raise ValueError("enhance model needs recipe.base_run (run dir)")
        base_model, base_params = load_model_from_run(base_run)
        return EnhancerModel(cfg, base_model, base_params)
    raise ValueError(f"unknown model kind {cfg.kind!r}")


def load_model_from_run(run_dir: str):
    """Rebuild a trained model from a run dir (config.json + best ckpt)."""
    import json

    import jax as _jax

    from amss_tpu.utils.config import recipe_from_dict

    with open(os.path.join(run_dir, "config.json")) as f:
        recipe = recipe_from_dict(json.load(f))
    model = make_model(recipe.model, base_run=recipe.base_run)
    target = {"params": model.init(_jax.random.PRNGKey(0))}
    import flax.serialization as fser

    name = "ckpt_best.msgpack"
    path = os.path.join(run_dir, name)
    if not os.path.exists(path):
        path = os.path.join(run_dir, "ckpt_latest.msgpack")
    with open(path, "rb") as f:
        raw = fser.msgpack_restore(f.read())
    from amss_tpu.ckpt.checkpoint import _split_raw

    raw, _ = _split_raw(raw)
    # EMA runs serve the averaged weights (what validation ranked ckpt_best
    # by); non-EMA checkpoints carry no ema_params and load unchanged.
    src = raw.get("ema_params", raw["params"]) if isinstance(raw, dict) else raw
    params = fser.from_state_dict(target["params"], fser.to_state_dict(src))
    return model, params


class Trainer:
    def __init__(
        self,
        recipe: RecipeConfig,
        store,
        workdir: str = "runs",
        mesh=None,
        run_dir: str | None = None,
    ):
        self.recipe = recipe
        self.rid = run_id(recipe)
        self.dir = run_dir or os.path.join(workdir, f"{recipe.name}_{self.rid}")
        self._check_corpus_collision(store)
        self.model = make_model(recipe.model, base_run=recipe.base_run)
        self.mixer = Mixer(
            store,
            nb_speakers=recipe.model.nb_speakers,
            chunk_samples=recipe.train.chunk_samples,
            seed=recipe.train.seed,
        )
        self.mesh = mesh if mesh is not None else make_mesh(recipe.train.data_axis)
        t = recipe.train
        if t.lr_schedule == "cosine":
            warmup = min(t.warmup_steps, max(t.steps // 10, 1))
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=t.lr,
                warmup_steps=warmup,
                # optax needs a positive cosine phase; tiny runs (dryrun's
                # steps=1) would otherwise hit decay_steps - warmup == 0
                decay_steps=max(t.steps, warmup + 1),
                end_value=t.lr / 20.0,
            )
        else:
            lr = t.lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(t.grad_clip),
            optax.adam(lr),
        )
        self.writer = MetricWriter(self.dir)
        self._step_fn = None
        self._valid_fn = None
        self._ckpt = AsyncCheckpointer()
        self._warned_summaries = False
        self._warned_quality = False
        self._quality_fn = None  # lazy jitted separate for valid_quality
        # Device-resident corpus mode: shards live in HBM; batches are plans.
        self.corpus = None
        if recipe.train.device_data:
            from amss_tpu.data.device_corpus import DeviceCorpus

            # Replicated upload: every device holds the corpus, batch plans
            # shard over `data`.  The flat array is threaded into the jit step
            # as an argument (never closure-captured) — see DeviceCorpus.
            self.corpus = DeviceCorpus(
                store,
                recipe.train.chunk_samples,
                sharding=replicated_sharding(self.mesh),
            )

    def _draw(self, split: str, step: int, batch_size: int, host: int = 0):
        """Host-side batch draw: a Plan in device-data mode, else audio."""
        if self.corpus is not None:
            return self.mixer.plan(split, step, batch_size, host=host)
        return self.mixer.batch(split, step, batch_size, host=host)

    def _make_prep(self):
        """In-step batch preprocessing: plan->gather (device mode) or int16
        dequantize (host mode).  Returns prep(batch, corpus_flat); the flat
        corpus rides in as a jit argument (closure capture would bake ~100s
        of MB into the compiled program — HTTP 413 on the axon tunnel)."""
        corpus = self.corpus
        if corpus is None:
            return lambda batch, corpus_flat: Trainer._dequantize(batch)

        def prep(batch, corpus_flat):
            sources = corpus.gather(
                batch["plan_ids"], batch["plan_starts"], batch["plan_gains"],
                flat=corpus_flat,
            )
            return {"sources": sources, "speaker_ids": batch["plan_ids"]}

        return prep

    # -- setup ---------------------------------------------------------------
    def init_state(self, seed: int | None = None) -> dict:
        key = jax.random.PRNGKey(self.recipe.train.seed if seed is None else seed)
        params = self.model.init(key)
        if self.recipe.pretrained_front:
            params = restore_subtree(
                self.recipe.pretrained_front, params, keys=["front"], best=True
            )
        state = {"params": params, "opt_state": self.tx.init(params), "step": 0}
        if self.recipe.train.ema_decay > 0.0:
            # a COPY: params and ema_params are both donated by the step, and
            # aliased buffers would be donated twice (runtime error)
            state["ema_params"] = jax.tree_util.tree_map(jnp.array, params)
        return state

    @staticmethod
    def _dequantize(batch: dict) -> dict:
        """int16 wire format -> float32 on device (inside jit).  Source audio
        is 16-bit PCM to begin with, and halving host->HBM bytes matters: the
        tunnel transfer, not compute, bounds step time (11 ms device step vs
        ~50 ms f32 transfer at batch 16)."""
        out = dict(batch)
        if "sources_q" in out:
            out["sources"] = out.pop("sources_q").astype(jnp.float32) * (1.0 / 32767.0)
        return out

    def _build_step(self):
        model, tx = self.model, self.tx
        t = self.recipe.train
        seed, accum, ema_decay = t.seed, max(t.accum_steps, 1), t.ema_decay
        if t.batch_size % accum != 0:
            raise ValueError(
                f"batch_size {t.batch_size} not divisible by accum_steps {accum}"
            )
        prep = self._make_prep()

        def grads_and_metrics(params, batch, rng):
            def loss_fn(p):
                return model.loss_from_batch(p, batch, rng=rng)

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, metrics

        def accumulated(params, batch, rng):
            """Mean grads/metrics over ``accum`` microbatches via lax.scan —
            O(batch/accum) activation memory inside one jit step.  Every loss
            is a per-utterance mean, so this equals the full-batch step up to
            fp summation order (tested in test_train_e2e.py)."""
            if accum == 1:
                return grads_and_metrics(params, batch, rng)
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                batch,
            )
            mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
            _, m_shape = jax.eval_shape(grads_and_metrics, params, mb0, rng)
            zeros = (
                jax.tree_util.tree_map(jnp.zeros_like, params),
                jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), m_shape
                ),
            )

            def body(carry, xs):
                mb, i = xs
                # distinct dropout key per microbatch (still f(seed, step, i))
                g, m = grads_and_metrics(params, mb, jax.random.fold_in(rng, i))
                gsum, msum = carry
                add = lambda a, b: a + b  # noqa: E731
                return (
                    jax.tree_util.tree_map(add, gsum, g),
                    jax.tree_util.tree_map(add, msum, m),
                ), None

            (gsum, msum), _ = jax.lax.scan(
                body, zeros, (micro, jnp.arange(accum))
            )
            mean = lambda x: x / accum  # noqa: E731
            return (
                jax.tree_util.tree_map(mean, gsum),
                jax.tree_util.tree_map(mean, msum),
            )

        def update(params, opt_state, batch, corpus_flat, front_grad_scale, step_idx):
            batch = prep(batch, corpus_flat)
            # Per-step dropout key, derived in-graph so resume stays bit-exact
            # (key = f(seed, step), no host RNG state to checkpoint).
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), step_idx)
            grads, metrics = accumulated(params, batch, rng)
            if "front" in grads:
                grads = {
                    **grads,
                    "front": jax.tree_util.tree_map(
                        lambda g: g * front_grad_scale, grads["front"]
                    ),
                }
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        cf_sh = rep if self.corpus is not None else None
        if ema_decay > 0.0:
            # EMA runs carry (and donate) the averaged params through the
            # step; the signature only grows when the feature is on, so every
            # existing caller/checkpoint sees the unchanged program.
            def step(params, opt_state, ema_params, batch, corpus_flat,
                     front_grad_scale, step_idx):
                params, opt_state, metrics = update(
                    params, opt_state, batch, corpus_flat,
                    front_grad_scale, step_idx,
                )
                ema_params = jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    ema_params, params,
                )
                return params, opt_state, ema_params, metrics

            self._step_fn = jax.jit(
                step,
                donate_argnums=(0, 1, 2),
                in_shardings=(rep, rep, rep, data, cf_sh, None, None),
                out_shardings=(rep, rep, rep, rep),
            )
        else:
            self._step_fn = jax.jit(
                update,
                donate_argnums=(0, 1),
                in_shardings=(rep, rep, data, cf_sh, None, None),
                out_shardings=(rep, rep, rep),
            )

        def valid(params, batch, corpus_flat):
            l, metrics = model.loss_from_batch(params, prep(batch, corpus_flat))
            return {"loss": l, **metrics}  # canonical total-objective key

        self._valid_fn = jax.jit(
            valid, in_shardings=(rep, data, cf_sh), out_shardings=rep
        )

        # Multi-step call: lax.scan the SAME per-step update over [k, B, ...]
        # batches — one dispatch (one tunnel round trip, one donation cycle)
        # buys k optimizer steps.  The freeze-front gate moves in-graph
        # (f(step index)) so a freeze transition inside a chunk stays exact.
        self._multi_fn = None
        if max(t.steps_per_call, 1) > 1:
            freeze = self.recipe.freeze_front_steps
            sdata = stacked_batch_sharding(self.mesh)

            def scan_steps(params, opt_state, ema_params, sbatch, corpus_flat,
                           step0):
                k = jax.tree_util.tree_leaves(sbatch)[0].shape[0]

                def body(carry, xs):
                    p, o, e = carry
                    b, i = xs
                    fs = jnp.where(i < freeze, 0.0, 1.0).astype(jnp.float32)
                    p, o, m = update(p, o, b, corpus_flat, fs, i)
                    if e is not None:
                        e = jax.tree_util.tree_map(
                            lambda ee, pp: ema_decay * ee
                            + (1.0 - ema_decay) * pp,
                            e, p,
                        )
                    return (p, o, e), m

                carry, ms = jax.lax.scan(
                    body, (params, opt_state, ema_params),
                    (sbatch, step0 + jnp.arange(k, dtype=jnp.int32)),
                )
                return carry, ms

            if ema_decay > 0.0:
                def multi(params, opt_state, ema_params, sbatch, corpus_flat,
                          step0):
                    (p, o, e), ms = scan_steps(
                        params, opt_state, ema_params, sbatch, corpus_flat,
                        step0,
                    )
                    return p, o, e, ms

                self._multi_fn = jax.jit(
                    multi,
                    donate_argnums=(0, 1, 2),
                    in_shardings=(rep, rep, rep, sdata, cf_sh, None),
                    out_shardings=(rep, rep, rep, rep),
                )
            else:
                def multi(params, opt_state, sbatch, corpus_flat, step0):
                    (p, o, _), ms = scan_steps(
                        params, opt_state, None, sbatch, corpus_flat, step0
                    )
                    return p, o, ms

                self._multi_fn = jax.jit(
                    multi,
                    donate_argnums=(0, 1),
                    in_shardings=(rep, rep, sdata, cf_sh, None),
                    out_shardings=(rep, rep, rep),
                )

    def _host_arrays(self, batch) -> dict:
        """One host batch (this process's LOCAL shard) -> wire-format arrays."""
        if self.corpus is not None:  # plan mode: a few hundred bytes per step
            return {
                "plan_ids": batch.speaker_ids,
                "plan_starts": batch.starts,
                "plan_gains": batch.gains,
            }
        q = np.clip(batch.sources * 32767.0, -32767.0, 32767.0).astype(np.int16)
        arrays = {"sources_q": q}
        if self.recipe.model.kind == "l41":
            arrays["speaker_ids"] = batch.speaker_ids
        return arrays

    def _put(self, arrays: dict, sh):
        """Host arrays -> device, single-process or multi-host.

        Single-process: a plain sharded device_put.  Multi-host: each process
        contributes its local slice of the global batch via
        jax.make_array_from_process_local_data (the JAX-native multi-host
        input path — SURVEY.md §2.7 per-host input sharding over DCN)."""
        if jax.process_count() == 1:
            return {k: jax.device_put(v, sh) for k, v in arrays.items()}
        return {
            k: jax.make_array_from_process_local_data(sh, v)
            for k, v in arrays.items()
        }

    def _device_batch(self, batch):
        return self._put(self._host_arrays(batch), batch_sharding(self.mesh))

    def _device_batch_stacked(self, hosts: list):
        """k host batches -> one [k, B, ...] device batch (step axis
        replicated, batch axis sharded) for the multi-step scan call."""
        per = [self._host_arrays(h) for h in hosts]
        stacked = {k: np.stack([a[k] for a in per]) for k in per[0]}
        return self._put(stacked, stacked_batch_sharding(self.mesh))

    def _check_corpus_collision(self, store) -> None:
        """Refuse to reuse a run dir that was trained on a DIFFERENT corpus.

        The run id hashes the recipe config only — the corpus path is a
        Trainer argument, so two runs with identical configs on different
        corpora resolve to the same dir and the second silently restores/
        overwrites the first (this cost a full retrain in round 3).  The
        corpus root is recorded in a ``corpus.json`` sidecar (NOT inside
        config.json, whose stored form is the hash identity of the dir)."""
        self._corpus_root = os.path.abspath(getattr(store, "root", ""))
        side = os.path.join(self.dir, "corpus.json")
        if not os.path.exists(side):
            return
        import json

        with open(side) as f:
            prev = json.load(f).get("corpus_root", "")
        if prev and self._corpus_root and prev != self._corpus_root:
            raise ValueError(
                f"run dir {self.dir} was trained on corpus {prev!r} but this "
                f"Trainer was given {self._corpus_root!r}; the run id hashes "
                "the config only, so pass a distinct workdir/run_dir per "
                "corpus (or delete the old dir) instead of overwriting it"
            )

    def _write_config(self):
        """Run-dir provenance: the full recipe as config.json, so downstream
        stages (enhancement, evaluation) can rebuild this model from the dir
        alone (the reference's run-id/log-dir convention, SURVEY.md §5.6)."""
        import json

        from amss_tpu.utils.config import recipe_to_dict

        os.makedirs(self.dir, exist_ok=True)
        with open(os.path.join(self.dir, "config.json"), "w") as f:
            json.dump(recipe_to_dict(self.recipe), f, indent=1)
        if self._corpus_root:
            with open(os.path.join(self.dir, "corpus.json"), "w") as f:
                json.dump({"corpus_root": self._corpus_root}, f, indent=1)

    def _compile_step(self, state: dict, batch0: dict) -> None:
        """AOT-compile the train step at the real shapes (no execution, no
        donation).  Separate so the device-data probe's failure path can be
        exercised in tests."""
        args = (state["params"], state["opt_state"])
        if "ema_params" in state:
            args += (state["ema_params"],)
        self._step_fn.lower(
            *args, batch0, self.corpus.flat, jnp.float32(1.0), jnp.int32(0)
        ).compile()

    def _probe_device_data(self, state: dict) -> None:
        """AOT-compile the device-data step BEFORE training consumes donated
        buffers; on a tunnel payload rejection (HTTP 413 — the axon terminal
        bounds the compile-request body, and requests have been observed to
        scale with the resident corpus at ~350 MB), fall back to the host
        int16-wire input path with a warning instead of dying mid-run."""
        import warnings

        local_bs = self.recipe.train.batch_size // jax.process_count()
        batch0 = self._device_batch(
            self._draw("train", 0, local_bs, host=jax.process_index())
        )
        try:
            self._compile_step(state, batch0)
        except Exception as e:  # noqa: BLE001 — runtime error class varies
            msg = str(e)
            if "413" not in msg and "length limit" not in msg:
                raise
            warnings.warn(
                "device_data corpus exceeds the tunnel compile-payload limit "
                f"({msg[:120]}); falling back to host int16-wire input",
                stacklevel=2,
            )
            self.corpus = None
            self._step_fn = None
            self._valid_fn = None
            self._build_step()

    # -- fit loop -------------------------------------------------------------
    def fit(self, state: dict | None = None, log_every: int = 50) -> dict:
        r = self.recipe.train
        self._write_config()
        if state is None:
            state = self.init_state()
        if self._step_fn is None:
            self._build_step()
        if max(r.steps_per_call, 1) > 1:
            return self._fit_multi(state, log_every)
        if self.corpus is not None:
            self._probe_device_data(state)
        params, opt_state = state["params"], state["opt_state"]
        ema_on = r.ema_decay > 0.0
        # resume-from-pre-EMA checkpoint: seed the average at current params
        # (copied — params and ema_params are both donated, and aliased
        # buffers would be donated twice)
        ema_params = (
            state.get("ema_params")
            or jax.tree_util.tree_map(jnp.array, params)
        ) if ema_on else None
        # restored checkpoints hold step as a read-only 0-d array (msgpack
        # buffer-backed); plain int keeps later `step += k` off that buffer
        start = int(state["step"])
        t0 = time.time()
        from amss_tpu.data.prefetch import Prefetcher

        # Multi-host DP: each process DRAWS only its local slice of the global
        # batch (independent per-host stream) and contributes it via
        # make_array_from_process_local_data in _device_batch.
        n_proc = jax.process_count()
        if r.batch_size % n_proc != 0:
            raise ValueError(
                f"global batch {r.batch_size} not divisible by {n_proc} processes"
            )
        local_bs = r.batch_size // n_proc
        host = jax.process_index()
        batches = Prefetcher(
            make_batch=lambda s: self._draw("train", s, local_bs, host=host),
            put_batch=self._device_batch,
            start_step=start,
            end_step=r.steps,
        )
        corpus_flat = self.corpus.flat if self.corpus is not None else None
        best_v, stale = float("inf"), 0  # early-stopping bookkeeping
        last_step = start - 1
        for step, batch in batches:
            last_step = step
            fscale = jnp.float32(0.0 if step < self.recipe.freeze_front_steps else 1.0)
            if ema_on:
                params, opt_state, ema_params, metrics = self._step_fn(
                    params, opt_state, ema_params, batch, corpus_flat,
                    fscale, jnp.int32(step),
                )
            else:
                params, opt_state, metrics = self._step_fn(
                    params, opt_state, batch, corpus_flat, fscale, jnp.int32(step)
                )

            if (step + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_sec"] = log_every / max(time.time() - t0, 1e-9)
                t0 = time.time()
                self.writer.scalars(step + 1, {f"train/{k}": v for k, v in m.items()})

            if (step + 1) % r.valid_every == 0 or step + 1 == r.steps:
                # EMA runs validate (and rank ckpt_best by) the averaged
                # weights — those are the ones served downstream.
                vloss = self._validate(ema_params if ema_on else params, step)
                # Multi-host: params are replicated, so only process 0 writes —
                # N hosts racing on the same ckpt path would be N redundant
                # writes with last-writer-wins manifests.
                if jax.process_index() == 0:
                    ck = {"params": params, "opt_state": opt_state, "step": step + 1}
                    if ema_on:
                        ck["ema_params"] = ema_params
                    self._ckpt.save(self.dir, ck, step=step + 1, metric=vloss)
                if r.early_stop_patience > 0:
                    if vloss < best_v:
                        best_v, stale = vloss, 0
                    else:
                        stale += 1
                    if stale >= r.early_stop_patience:
                        # ckpt_best already holds the best-on-valid weights;
                        # stopping loses nothing but wasted steps.
                        self.writer.scalars(
                            step + 1, {"train/early_stopped": 1.0}
                        )
                        batches.close()
                        break
        self._ckpt.wait()  # drain async checkpoint writes before returning
        self.writer.flush()
        out = {"params": params, "opt_state": opt_state, "step": last_step + 1}
        if ema_on:
            out["ema_params"] = ema_params
        return out

    def _fit_multi(self, state: dict, log_every: int = 50) -> dict:
        """fit() at steps_per_call > 1: chunks of k steps per jitted call.

        Chunk boundaries never cross a validation boundary, so the
        valid/checkpoint/early-stop cadence is identical to fit(); steady-
        state chunks are steps_per_call long and the remainder before each
        boundary compiles one extra (cached) program.  Per-step math is the
        single step scanned — bit-equal to fit() (tested)."""
        r = self.recipe.train
        K = r.steps_per_call
        params, opt_state = state["params"], state["opt_state"]
        ema_on = r.ema_decay > 0.0
        ema_params = (
            state.get("ema_params")
            or jax.tree_util.tree_map(jnp.array, params)
        ) if ema_on else None
        # restored checkpoints hold step as a read-only 0-d array (msgpack
        # buffer-backed); plain int keeps later `step += k` off that buffer
        start = int(state["step"])
        n_proc = jax.process_count()
        if r.batch_size % n_proc != 0:
            raise ValueError(
                f"global batch {r.batch_size} not divisible by {n_proc} processes"
            )
        local_bs = r.batch_size // n_proc
        host = jax.process_index()

        def chunk_len(step: int) -> int:
            next_valid = (step // r.valid_every + 1) * r.valid_every
            return min(K, next_valid - step, r.steps - step)

        if self.corpus is not None:
            self._probe_device_data_multi(
                params, opt_state, ema_params, start, max(chunk_len(start), 1),
                local_bs, host,
            )
        from amss_tpu.data.prefetch import Prefetcher

        # The prefetch thread only DRAWS host batches here (put_batch =
        # identity); the k chunk batches are stacked and uploaded in one
        # device_put below.  Drawing still overlaps device compute.
        batches = Prefetcher(
            make_batch=lambda s: self._draw("train", s, local_bs, host=host),
            put_batch=lambda h: h,  # keep host-side; stacked per chunk
            start_step=start,
            end_step=r.steps,
        )
        it = iter(batches)
        corpus_flat = self.corpus.flat if self.corpus is not None else None
        best_v, stale = float("inf"), 0
        step, last_log, t0 = start, start, time.time()
        try:
            while step < r.steps:
                k = chunk_len(step)
                hosts = [next(it)[1] for _ in range(k)]
                sbatch = self._device_batch_stacked(hosts)
                if ema_on:
                    params, opt_state, ema_params, ms = self._multi_fn(
                        params, opt_state, ema_params, sbatch, corpus_flat,
                        jnp.int32(step),
                    )
                else:
                    params, opt_state, ms = self._multi_fn(
                        params, opt_state, sbatch, corpus_flat, jnp.int32(step)
                    )
                step += k

                if step - last_log >= log_every or step == r.steps:
                    m = {kk: float(v[-1]) for kk, v in ms.items()}
                    m["steps_per_sec"] = (step - last_log) / max(
                        time.time() - t0, 1e-9
                    )
                    t0, last_log = time.time(), step
                    self.writer.scalars(
                        step, {f"train/{kk}": v for kk, v in m.items()}
                    )

                if step % r.valid_every == 0 or step == r.steps:
                    vloss = self._validate(
                        ema_params if ema_on else params, step - 1
                    )
                    if jax.process_index() == 0:
                        ck = {
                            "params": params,
                            "opt_state": opt_state,
                            "step": step,
                        }
                        if ema_on:
                            ck["ema_params"] = ema_params
                        self._ckpt.save(self.dir, ck, step=step, metric=vloss)
                    if r.early_stop_patience > 0:
                        if vloss < best_v:
                            best_v, stale = vloss, 0
                        else:
                            stale += 1
                        if stale >= r.early_stop_patience:
                            self.writer.scalars(
                                step, {"train/early_stopped": 1.0}
                            )
                            break
        finally:
            batches.close()
        self._ckpt.wait()
        self.writer.flush()
        out = {"params": params, "opt_state": opt_state, "step": step}
        if ema_on:
            out["ema_params"] = ema_params
        return out

    def _probe_device_data_multi(self, params, opt_state, ema_params,
                                 start: int, k: int, local_bs: int,
                                 host: int) -> None:
        """413-payload probe for the multi-step program (mirrors
        _probe_device_data; see it for why this runs before donation)."""
        import warnings

        hosts = [self._draw("train", start + j, local_bs, host=host)
                 for j in range(k)]
        sbatch = self._device_batch_stacked(hosts)
        args = (params, opt_state)
        if ema_params is not None:
            args += (ema_params,)
        try:
            self._multi_fn.lower(
                *args, sbatch, self.corpus.flat, jnp.int32(start)
            ).compile()
        except Exception as e:  # noqa: BLE001 — runtime error class varies
            msg = str(e)
            if "413" not in msg and "length limit" not in msg:
                raise
            warnings.warn(
                "device_data corpus exceeds the tunnel compile-payload limit "
                f"({msg[:120]}); falling back to host int16-wire input",
                stacklevel=2,
            )
            self.corpus = None
            self._step_fn = None
            self._valid_fn = None
            self._build_step()

    def _validate(self, params, step) -> float:
        r = self.recipe.train
        # L41's centroid table only covers train-split speakers, so a
        # speaker-disjoint valid split would score untrained centroid rows
        # (noise).  Validate the enrolled objective on train speakers at
        # UNSEEN chunk offsets instead (the model's closed-speaker setting).
        split, offset = (
            ("train", 5_000_000) if self.recipe.model.kind == "l41" else ("valid", 0)
        )
        # Mirror fit()'s multi-host contract: local slice per process.
        local_bs = r.batch_size // jax.process_count()
        host = jax.process_index()
        corpus_flat = self.corpus.flat if self.corpus is not None else None
        losses = []
        for i in range(r.valid_steps):
            hb = self._draw(split, offset + i, local_bs, host=host)
            metrics = self._valid_fn(params, self._device_batch(hb), corpus_flat)
            losses.append(float(metrics["loss"]))
        vloss = float(np.mean(losses))
        self.writer.scalars(step + 1, {"valid/loss": vloss})
        if r.valid_quality:
            self._quality_summary(params, step, split, offset)
        self._image_summaries(params, step)
        return vloss

    def _quality_summary(self, params, step, split, offset):
        """valid/si_sdri: the full inference path (separate -> PIT SI-SDR) on
        one valid batch — the quality curve logged next to the loss curve
        (train.valid_quality).  Best-effort like image summaries: never
        kills training, warns once on breakage."""
        if not hasattr(self.model, "separate") or self._warned_quality:
            return
        try:
            import jax.numpy as jnp

            from amss_tpu.ops.metrics import pit_si_sdr, si_sdr

            hb = self.mixer.batch(split, offset + 999_983,
                                  min(self.recipe.train.batch_size, 8))
            if self._quality_fn is None:
                if self.recipe.model.kind == "l41":  # enrolled path
                    self._quality_fn = jax.jit(
                        lambda p, m, s: self.model.separate(p, m, speaker_ids=s)
                    )
                else:
                    self._quality_fn = jax.jit(
                        lambda p, m, s: self.model.separate(p, m)
                    )
            src = jnp.asarray(hb.sources)
            mix = src.sum(axis=1)
            est = self._quality_fn(params, mix, jnp.asarray(hb.speaker_ids))
            scores, _ = pit_si_sdr(est, src)
            base = jnp.mean(
                si_sdr(jnp.broadcast_to(mix[:, None, :], src.shape), src),
                axis=-1,
            )
            q = float(jnp.mean(scores - base))
            self.writer.scalars(step + 1, {"valid/si_sdri": q})
        except Exception:
            self._warned_quality = True
            import logging

            logging.getLogger(__name__).warning(
                "valid_quality summary failed; disabling for this run",
                exc_info=True,
            )

    def _image_summaries(self, params, step):
        """Spectrogram/mask heatmaps on one valid mixture (SURVEY.md §5.5)."""
        if not hasattr(self.model, "front") or self._warned_summaries:
            return
        try:
            hb = self.mixer.batch("valid", 0, 1)
            mix = jnp.asarray(hb.sources.sum(axis=1))
            # enhance models carry no "front" subtree of their own — their
            # frozen analysis params live on the model (resolved base chain)
            fp = params.get("front", getattr(self.model, "front_params", None))
            codes, _ = self.model.front.encode(fp, mix)
            feats = self.model.front.features(fp, codes)
            self.writer.image(step + 1, "valid/mix_log_spectrogram",
                              np.asarray(feats[0]).T)
            if hasattr(self.model, "separate"):
                est = self.model.separate(params, mix)
                ecodes, _ = self.model.front.encode(fp, est[:, 0])
                self.writer.image(step + 1, "valid/est0_log_spectrogram",
                                  np.log(np.asarray(ecodes[0]).T + 1e-7))
        except Exception:
            # Best-effort (never kill training), but not silent: real breakage
            # (e.g. a front API change) must surface at least once per run.
            if not self._warned_summaries:
                self._warned_summaries = True
                import logging

                logging.getLogger(__name__).warning(
                    "image summaries failed; disabling for this run", exc_info=True
                )

    def restore(self, best: bool = False) -> dict:
        self._ckpt.wait()  # a pending async write must land before reading
        target = self.init_state()
        if "ema_params" in target:
            # A pre-EMA checkpoint (run recorded before ema_decay was turned
            # on) has no ema_params subtree; restoring against a target that
            # expects one would raise the misleading architecture-mismatch
            # error.  Peek the blob and drop the key — fit() then seeds the
            # average at the restored params.
            import flax.serialization as fser

            from amss_tpu.ckpt.checkpoint import _split_raw

            name = "ckpt_best.msgpack" if best else "ckpt_latest.msgpack"
            with open(os.path.join(self.dir, name), "rb") as f:
                raw, _ = _split_raw(fser.msgpack_restore(f.read()))
            if "ema_params" not in raw:
                target = {k: v for k, v in target.items() if k != "ema_params"}
        state, _ = restore_checkpoint(self.dir, target, best=best)
        return state

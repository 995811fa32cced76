"""Dev smoke: init -> loss -> one train step -> separate for every model kind,
tiny shapes, CPU.  Not a test — a fast bug shaker (pytest startup is ~2 min
on this host)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env ships with JAX_PLATFORMS=axon
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()


import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from amss_tpu.configs.recipes import (
    c1_stft_dpcl,
    c2_pretrain_adapt,
    c2_adapt_dpcl,
    c3_l41,
    c4_chimera_3mix,
    c6_tasnet,
    c7_realtime,
)
from amss_tpu.data.synthetic import make_synthetic_corpus
from amss_tpu.train.engine import Trainer
from amss_tpu.utils.config import TrainConfig
import dataclasses


def tiny(recipe, **tover):
    t = dataclasses.replace(
        recipe.train,
        batch_size=2,
        chunk_samples=2048,
        steps=2,
        valid_every=2,
        valid_steps=1,
        **tover,
    )
    sep = dataclasses.replace(recipe.model.sep, hidden=32, layers=1, embed_dim=8)
    model = dataclasses.replace(recipe.model, sep=sep)
    return dataclasses.replace(recipe, train=t, model=model)


def main():
    tmp = tempfile.mkdtemp()
    store = make_synthetic_corpus(os.path.join(tmp, "corpus"), n_speakers=12,
                                  seconds_per_speaker=3.0)
    runs = os.path.join(tmp, "runs")

    for name, recipe in [
        ("c1_dpcl", tiny(c1_stft_dpcl())),
        ("c2_pretrain", tiny(c2_pretrain_adapt())),
        ("c2_adapt_dpcl", tiny(c2_adapt_dpcl())),
        ("c3_l41", tiny(c3_l41(n_train_speakers=12))),
        ("c4_chimera", tiny(c4_chimera_3mix())),
        ("c4_chimera_psa", tiny(dataclasses.replace(
            c4_chimera_3mix(),
            model=dataclasses.replace(c4_chimera_3mix().model, loss_variant="psa"),
        ))),
        ("c6_tasnet", tiny(c6_tasnet())),
        ("c6_tasnet_dprnn", tiny(dataclasses.replace(
            c6_tasnet(),
            model=dataclasses.replace(
                c6_tasnet().model,
                sep=dataclasses.replace(
                    c6_tasnet().model.sep, trunk="dprnn", blocks=6,
                    chunk_frames=8
                ),
            ),
        ))),
        ("c7_realtime", tiny(dataclasses.replace(
            c7_realtime(),
            model=dataclasses.replace(
                c7_realtime().model,
                sep=dataclasses.replace(
                    c7_realtime().model.sep, blocks=3, repeats=2
                ),
            ),
        ))),
    ]:
        tr = Trainer(recipe, store, workdir=runs)
        state = tr.fit()
        print(f"{name}: fit OK, step={state['step']}")
        if hasattr(tr.model, "separate"):
            mix = jnp.asarray(
                np.random.default_rng(0).standard_normal((2, 2048)), jnp.float32
            )
            if recipe.model.kind == "l41":
                est = tr.model.separate(state["params"], mix,
                                        speaker_ids=jnp.zeros((2, 2), jnp.int32))
            else:
                est = tr.model.separate(state["params"], mix)
            print(f"{name}: separate OK {est.shape}")

    # partial restore path (c2 finetune from pretrain ckpt)
    pre = tiny(c2_pretrain_adapt())
    tr_pre = Trainer(pre, store, workdir=runs)
    tr_pre.fit()
    ft = tiny(c2_adapt_dpcl(pretrained_front=tr_pre.dir))
    tr_ft = Trainer(ft, store, workdir=runs)
    tr_ft.fit()
    print("partial-restore finetune OK")
    print("SMOKE PASS")


if __name__ == "__main__":
    main()

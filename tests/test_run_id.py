"""run_id stability: the config hash names every run dir (SURVEY.md §5.6),
so adding a config field must never move the id of existing configs — that
orphans every prior run from resume/evaluate-by-recipe (bit round 3 when
SeparatorConfig.heads landed for the dpt trunk)."""

import dataclasses
import json
import os

from amss_tpu.utils.config import recipe_from_dict, run_id, run_id_from_stored

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_checkpoint_ids_reproduce():
    """The committed checkpoints' config.json files were written by the runs
    named in EXPORT.json (…_<12-hex-id>); rebuilding the config must yield
    the same id even though the config schema has since grown."""
    checked = 0
    for name in os.listdir(os.path.join(REPO, "checkpoints")):
        d = os.path.join(REPO, "checkpoints", name)
        cfg_path = os.path.join(d, "config.json")
        exp_path = os.path.join(d, "EXPORT.json")
        if not (os.path.exists(cfg_path) and os.path.exists(exp_path)):
            continue
        src = json.load(open(exp_path))["source_run"]
        expect = os.path.basename(src).rsplit("_", 1)[-1]
        stored = json.load(open(cfg_path))
        got = run_id_from_stored(stored)
        assert got == expect, f"{name}: run_id moved {expect} -> {got}"
        # round-3+ configs survive the dataclass round trip too (resume path:
        # recipe_from_dict -> Trainer -> run_id); pre-round-3 stored configs
        # (c1_dpcl) only guarantee the stored-form identity above
        if "expansion" in stored["model"]["sep"]:
            assert run_id(recipe_from_dict(stored)) == expect, name
        checked += 1
    assert checked >= 4  # c1_dpcl, c6_flagship, c7_causal, c6_3spk


def test_dpt_heads_distinguishes_runs():
    """heads is excluded from the hash only while it cannot affect the model
    (trunk != 'dpt'); dpt runs differing in heads must not collide."""
    from amss_tpu.configs.recipes import c6_tasnet

    r = c6_tasnet()

    def with_sep(**kw):
        return dataclasses.replace(
            r, model=dataclasses.replace(
                r.model, sep=dataclasses.replace(r.model.sep, **kw)
            )
        )

    assert run_id(with_sep(trunk="dpt", heads=4)) != run_id(
        with_sep(trunk="dpt", heads=8)
    )
    # and for non-dpt trunks heads is hash-neutral
    assert run_id(with_sep(heads=4)) == run_id(with_sep(heads=8))

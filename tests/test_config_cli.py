"""Config system + train CLI coverage.

- Every shipped experiment recipe parses through ``load_experiment`` and
  names a registered model (reference train.py:211-214 --folder convention).
- Recipe values stay pinned to the reference's own YAMLs: for every key our
  recipe sets, the same-named reference recipe must agree
  (/root/reference/cot_experiments/*/config.yaml).
- The CLI drives end-to-end in synthetic smoke mode (config -> model ->
  loaders -> train epoch -> epoch-end lookahead sync -> eval -> checkpoint),
  the rebuild's analog of the reference's only integration test: a real
  train run (SURVEY.md section 4).
"""

import glob
import os
import shutil

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP_DIR = os.path.join(REPO, "cot_experiments")
REF_EXP_DIR = "/root/reference/cot_experiments"

RECIPES = sorted(
    os.path.basename(os.path.dirname(p))
    for p in glob.glob(os.path.join(EXP_DIR, "*", "config.yaml")))


def test_all_recipes_present():
    # the reference ships 7 recipes (SURVEY.md section 2.9)
    assert len(RECIPES) == 7, RECIPES


@pytest.mark.parametrize("name", RECIPES)
def test_recipe_parses_and_names_registered_model(name):
    from cotnet_tpu.config import load_experiment
    from cotnet_tpu.models import is_model

    cfg = load_experiment(os.path.join(EXP_DIR, name))
    assert is_model(cfg.model.name), cfg.model.name
    assert cfg.solver.epochs > 0
    assert cfg.data_loader.batch_size > 0
    assert cfg.eval.eval_metric in ("top1", "top5")


@pytest.mark.parametrize("name", RECIPES)
def test_recipe_values_match_reference(name):
    """Every key our recipe sets must agree with the reference's same-named
    recipe (sections compared recursively; our YAMLs are regenerated from
    the reference values, so any drift is a transcription bug)."""
    ref_path = os.path.join(REF_EXP_DIR, name, "config.yaml")
    if not os.path.exists(ref_path):
        pytest.skip("reference recipes not available")
    with open(os.path.join(EXP_DIR, name, "config.yaml")) as f:
        ours = yaml.safe_load(f)
    with open(ref_path) as f:
        ref = yaml.safe_load(f)

    def check(ours, ref, path):
        for k, v in ours.items():
            if k not in ref:
                continue  # our file may carry keys the reference defaults
            r = ref[k]
            if isinstance(v, dict) and isinstance(r, dict):
                check(v, r, path + (k,))
            elif isinstance(v, float) or isinstance(r, float):
                assert float(v) == pytest.approx(float(r)), (path, k, v, r)
            else:
                assert v == r, (path, k, v, r)

    check(ours, ref, ())


def test_cli_synthetic_end_to_end(tmp_path):
    """train_cli.main in synthetic smoke mode: one epoch of two steps on a
    small model, then eval + checkpoint, with artifacts landing in the
    experiment folder (reference train.py: logs/checkpoints in --folder)."""
    from cotnet_tpu import train_cli

    src = os.path.join(EXP_DIR, "CoTNet-50-350epoch", "config.yaml")
    exp = tmp_path / "exp"
    exp.mkdir()
    shutil.copy(src, exp / "config.yaml")

    # batch 8: divisible by the hermetic suite's 8 fake-device data mesh
    train_cli.main(["--folder", str(exp), "--synthetic", "--steps", "2",
                    "--epochs", "1", "--img-size", "32", "--batch-size", "8",
                    "--model", "resnet18"])

    assert (exp / "log.txt").exists()
    log = (exp / "log.txt").read_text()
    assert "eval epoch" in log and "done; best" in log
    ckpts = list((exp / "checkpoints").glob("*")) if (
        exp / "checkpoints").exists() else []
    assert ckpts, "no checkpoint written"

"""CLI compatibility: every bundled experiment script's flag matrix must
parse through the real argument parsers (the scripts ARE the paper's
experiment spec, SURVEY §2.3; reference experiments/*.sh)."""

import glob
import os
import re
import shlex

import pytest

from points2surf_tpu.cli.eval_args import parse_arguments as parse_eval
from points2surf_tpu.cli.train_args import parse_arguments as parse_train

EXPERIMENTS = os.path.join(os.path.dirname(__file__), "..", "experiments")


def _script_args(path):
    """Extract the argv passed to the python entry point in a script."""
    txt = "\n".join(
        ln for ln in open(path).read().splitlines()
        if not ln.lstrip().startswith("#")
    )
    _, after = txt.split("python -m", 1)
    after = after.split("\n\n")[0]
    # expand ${VAR:-default} shell defaults (env-overridable epoch budgets)
    after = re.sub(r"\$\{\w+:-([^}]*)\}", r"\1", after)
    tokens = shlex.split(after.replace("\\\n", " ").rstrip("\\ \t\n"))
    # drop the module name; substitute the script-derived ${NAME}
    name = os.path.basename(path)[:-3]
    name = name.split("_", 1)[1]  # train_/eval_ prefix
    return [name if t == "${NAME}" else t for t in tokens[1:]]


@pytest.mark.parametrize(
    "script", sorted(glob.glob(os.path.join(EXPERIMENTS, "train_*.sh")))
)
def test_train_scripts_parse(script):
    args = _script_args(script)
    opt = parse_train(args)
    assert opt.name
    assert opt.nepoch > 0
    assert opt.points_per_patch > 0
    assert "imp_surf" in " ".join(opt.outputs)


@pytest.mark.parametrize(
    "script", sorted(glob.glob(os.path.join(EXPERIMENTS, "eval_*.sh")))
)
def test_eval_scripts_parse(script):
    args = _script_args(script)
    opt = parse_eval(args)
    assert opt.models
    assert opt.query_grid_resolution == 256
    assert opt.certainty_threshold == 13
    assert opt.sigma == 5
    assert len(opt.dataset) >= 1


def test_flag_matrix_vanilla_vs_max():
    """The two flagship configs must land the paper's architecture knobs
    (SURVEY §2.3 table)."""
    vanilla = parse_train(
        _script_args(os.path.join(EXPERIMENTS, "train_p2s_vanilla.sh"))
    )
    assert vanilla.nepoch == 150
    assert vanilla.patch_radius == 0.0
    assert vanilla.use_point_stn == 1
    assert vanilla.shared_transformer == 1
    assert vanilla.scheduler_steps == [75, 125]

    mx = parse_train(
        _script_args(os.path.join(EXPERIMENTS, "train_p2s_max.sh"))
    )
    assert mx.nepoch == 250
    assert mx.use_point_stn == 0
    assert mx.uniform_subsample == 1
    assert mx.scheduler_steps == [100, 200]


def test_train_dtype_default_is_float32():
    """Production default must stay float32: bf16 training fails the
    reconstruction-grade sign gates (docs/VALIDATION.md round 3). The
    precision-anneal flag defaults to auto (-1) and only activates when
    bfloat16 is explicitly requested."""
    from points2surf_tpu.cli.train_args import parse_arguments

    opt = parse_arguments(["--indir", "x", "--outdir", "y"])
    assert opt.train_dtype == "float32"
    assert opt.f32_finetune_epochs == -1

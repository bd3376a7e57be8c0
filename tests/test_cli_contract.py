"""CLI flag-contract parity: the reference README's exact example command
lines must parse (README.md:62-75)."""

import shlex
import sys

sys.path.insert(0, "scripts")


def test_reference_readme_training_command_parses():
    import importlib.util

    spec = importlib.util.spec_from_file_location("tm", "scripts/train_model.py")
    tm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tm)
    # train_model_with_multimodal adds --model-type etc on top.
    parser = tm.build_parser()
    parser.add_argument("--model-type", choices=["unimodal", "multimodal"], default="unimodal")
    parser.add_argument("--mod1-weight", type=float, default=1.0)
    parser.add_argument("--mod2-weight", type=float, default=1.0)

    # Verbatim from reference README.md:62-66 (minus the program name).
    cmd = (
        "--z_dim 10 --weight-decay 0.01 --learning-rate 0.001 --beta 0.5 "
        "--dataset cellexplorer-celltype --upload-model --wandb-tag no_curr_sup_pretrain_data "
        '--project results_celltype --finetune-without-labels False '
        "--pretrain-max-epochs 1 --finetune-max-epochs 1 --supervised-max-epochs 1 "
        "--batch-size 512 --supervised-batch-size 64 --early-stopping-patience 30 "
        "--gradient-clip-val 1.0 --train-val-split 0.8 --finetune-split 0.1 "
        "--output-dir trained_models"
    )
    args = parser.parse_args(shlex.split(cmd))
    assert args.z_dim == 10
    assert args.beta == 0.5
    assert args.finetune_without_labels is False  # our str2bool fixes the type=bool trap
    assert args.output_dir == "trained_models"
    assert args.upload_model is True


def test_console_entry_lists_every_subcommand():
    """The hippie-tpu console script (our working replacement for the
    reference's broken hippie-cli entry point, pyproject.toml:53-54) must
    advertise every wired subcommand and reject unknown ones."""
    import io
    from contextlib import redirect_stdout

    from hippie_tpu import cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["--help"])
    assert rc == 0
    help_text = buf.getvalue()
    for sub in ("train", "train-multimodal", "sweep", "lr-sweep", "infer",
                "kfold", "serve", "export", "synth", "bench"):
        assert f"  {sub} " in help_text or f"{{{sub}," in help_text or f",{sub}," in help_text, sub
    assert cli.main(["definitely-not-a-command"]) == 2


def test_reference_inference_command_parses():
    import importlib.util

    spec = importlib.util.spec_from_file_location("inf", "scripts/inference_from_trained_model.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    args = m.build_parser().parse_args(
        shlex.split(
            "--dataset cellexplorer-celltype --time-checkpoint /path/a.ckpt --wave-checkpoint /path/b.ckpt"
        )
    )
    assert args.z_dim == 64  # reference default (inference…py:19)
    assert args.output_dir == "./embeddings"

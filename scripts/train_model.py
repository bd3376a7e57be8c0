"""Unimodal 3-stage training CLI (contract of reference scripts/train_model.py).

Same flags, same output filenames (pretraining_<ds>_*_embeddings.csv,
<ds>_*_knn.csv, <ds>_*_embeddings.csv, Lightning-style .ckpt files), same
3-stage flow — running TPU-native on JAX/XLA. Extra flags beyond the
reference: --data-root, --output-dir, --checkpoint-dir, --seed, --wandb
(wandb is off/no-op by default instead of mandatory).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def str2bool(v):
    # The reference uses type=bool (any non-empty string is True — a CLI
    # trap, SURVEY.md §5); accept explicit true/false spellings as well.
    if isinstance(v, bool):
        return v
    return v.lower() not in ("false", "0", "no", "")


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--z_dim", type=int, default=5, required=False)
    parser.add_argument("--weight-decay", type=float, default=0.01)
    parser.add_argument("--learning-rate", type=float, default=0.001)
    parser.add_argument("--beta", type=float, default=1)
    parser.add_argument("--dataset", type=str, default="cellexplorer-celltype")
    parser.add_argument("--upload-model", action="store_true")
    parser.add_argument("--wandb-tag", type=str, default="no_curr_sup_pretrain_data")
    parser.add_argument("--project", type=str, default="HIPPIE final benchmarks w finetune without labels")
    parser.add_argument("--finetune-without-labels", type=str2bool, default=True)
    parser.add_argument("--pretrain-max-epochs", type=int, default=1)
    parser.add_argument("--finetune-max-epochs", type=int, default=1)
    parser.add_argument("--supervised-max-epochs", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--supervised-batch-size", type=int, default=64)
    parser.add_argument("--early-stopping-patience", type=int, default=30)
    parser.add_argument("--gradient-clip-val", type=float, default=1.0)
    parser.add_argument("--train-val-split", type=float, default=0.8)
    parser.add_argument("--finetune-split", type=float, default=0.1)
    parser.add_argument("--limit-train-batches", type=float, default=None)
    parser.add_argument("--limit-val-batches", type=float, default=None)
    # Extensions (not in the reference CLI):
    parser.add_argument("--data-root", type=str, default="datasets")
    parser.add_argument("--output-dir", type=str, default=".")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--wandb", action="store_true", help="enable wandb logging if installed")
    parser.add_argument("--strict-leakage-guard", action="store_true",
                        help="also exclude sister juxtacellular datasets (fixes quirk Q2)")
    parser.add_argument("--discover-datasets", action="store_true",
                        help="register custom dataset dirs found under --data-root (any dir "
                             "with waveforms.csv + isi_dist.csv; fresh source IDs, optional "
                             "registry.json pinning) so they join the pretraining pool")
    parser.add_argument("--resume", action="store_true",
                        help="orbax mid-run resume: continue interrupted stages exactly")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace of the run here")
    parser.add_argument("--log-file", type=str, default=None,
                        help="append per-epoch metrics as JSON lines to this file")
    parser.add_argument("--drop-index-column", action="store_true",
                        help="drop the CSV index feature (fixes quirk Q4; breaks numerical compat)")
    parser.add_argument("--honest-eval", action="store_true",
                        help="extract stage-3 embeddings WITHOUT class conditioning (fixes the label leak)")
    parser.add_argument("--loss-backend", choices=("xla", "pallas"), default="xla",
                        help="VAE-loss kernel inside every train/eval step")
    parser.add_argument("--dp-devices", type=int, default=None,
                        help="data-parallel training over the first N devices (jax Mesh + GSPMD)")
    parser.add_argument("--fsdp", action="store_true",
                        help="with --dp-devices: shard params + optimizer state per-leaf over "
                             "the mesh (ZeRO-style; GSPMD all-gathers on use) instead of "
                             "replicating them — cuts per-chip memory ~1/N")
    parser.add_argument("--aot-dir", type=str,
                        default=os.path.join(os.path.expanduser("~"), ".cache", "hippie_tpu_aot"),
                        help="cache dir for compiled stage-fit programs (serialized "
                             "executables): later processes load in ~0.2 s, skipping "
                             "trace, lowering AND backend compile; applies to "
                             "--dp-devices runs too. Keys include a source hash, so "
                             "edited code never replays stale programs. Pass '' to "
                             "disable. Default: on (%(default)s)")
    parser.add_argument("--stage1-wave-ckpt", type=str, default=None,
                        help="seed the wave model from this Lightning stage-1 ckpt and skip "
                             "its pretrain fit (e.g. an `hippie-tpu lr-sweep --export-winner` "
                             "output); geometry must match --z-dim/--num-blocks")
    parser.add_argument("--stage1-time-ckpt", type=str, default=None,
                        help="same for the time/ISI model")
    parser.add_argument("--fit-loop", choices=("device", "host"), default="device",
                        help="stage fits as ONE on-device while_loop (zero per-epoch host "
                             "round trips; logs replayed post-stage) or the per-epoch host loop "
                             "(live prints)")
    parser.add_argument("--progress-every", type=int, default=None,
                        help="device fit loop: run in N-epoch chunks with live per-epoch "
                             "prints between chunks (identical trajectory; ~0.1 s/chunk "
                             "overhead). Default: auto = patience-sized chunks on "
                             "multi-epoch stages; 0 = single dispatch, logs replayed "
                             "after the stage")
    parser.add_argument("--log-every-step", action="store_true",
                        help="with --log-file/--wandb: also record per-train-batch "
                             "{train_loss_step, train_mse_step, train_kl_step} "
                             "(the reference's per-step self.log granularity); "
                             "device fit loop only")
    parser.add_argument("--opt-state-dtype", choices=("float32", "bfloat16"), default="float32",
                        help="Adam moment storage dtype; bfloat16 halves optimizer HBM traffic")
    parser.add_argument("--optimizer", choices=("adamw", "schedule-free"), default="adamw",
                        help="'schedule-free' enables the working AdamWScheduleFree (the "
                             "reference vendors but never uses it); eval/ckpts/embeddings "
                             "use the averaged x iterate, ckpts omit optimizer_states")
    parser.add_argument("--block-backend", choices=("xla", "bf16", "fused", "pallas"), default="xla",
                        help="backbone block kernels for training steps: 'bf16' = "
                             "standard XLA ops with bfloat16 block activations (fp32 BN stats), "
                             "'fused' = hand-written fused fwd/bwd (bf16 activations) as XLA ops, "
                             "'pallas' = the same as Mosaic megakernels, 'xla' = plain autodiff")
    return parser


def run(args, model_type: str = "unimodal"):
    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from hippie_tpu.train.pipeline import PipelineConfig, run_pipeline
    from hippie_tpu.evaluate.confmat import make_confmat
    from hippie_tpu.utils import wandb_shim

    if args.wandb:
        wandb_shim.enable()
    wandb = wandb_shim.get()
    if wandb_shim.is_enabled():
        wandb.init(project=args.project, name=f"{args.wandb_tag}{args.dataset}_{model_type}_{args.z_dim}")

    from hippie_tpu.utils.logging import JsonlLogger

    sinks = []
    if wandb_shim.is_enabled():
        sinks.append(lambda d: wandb.log(d))
    log_fn = JsonlLogger(getattr(args, "log_file", None), also=sinks) if (
        getattr(args, "log_file", None) or sinks
    ) else None

    cfg = PipelineConfig(
        z_dim=args.z_dim,
        weight_decay=args.weight_decay,
        learning_rate=args.learning_rate,
        beta=args.beta,
        dataset=args.dataset,
        finetune_without_labels=args.finetune_without_labels,
        pretrain_max_epochs=args.pretrain_max_epochs,
        finetune_max_epochs=args.finetune_max_epochs,
        supervised_max_epochs=args.supervised_max_epochs,
        batch_size=args.batch_size,
        supervised_batch_size=args.supervised_batch_size,
        early_stopping_patience=args.early_stopping_patience,
        gradient_clip_val=args.gradient_clip_val,
        train_val_split=args.train_val_split,
        finetune_split=args.finetune_split,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
        model_type=model_type,
        mod1_weight=getattr(args, "mod1_weight", 1.0),
        mod2_weight=getattr(args, "mod2_weight", 1.0),
        data_root=args.data_root,
        output_dir=args.output_dir,
        checkpoint_dir=args.checkpoint_dir,
        seed=args.seed,
        strict_leakage_guard=args.strict_leakage_guard,
        discover_datasets=getattr(args, "discover_datasets", False),
        resume=args.resume,
        profile_dir=args.profile_dir,
        drop_index_column=args.drop_index_column,
        honest_eval=args.honest_eval,
        loss_backend=getattr(args, "loss_backend", "xla"),
        block_backend=getattr(args, "block_backend", "xla"),
        opt_state_dtype=(None if getattr(args, "opt_state_dtype", "float32") == "float32"
                         else args.opt_state_dtype),
        dp_devices=getattr(args, "dp_devices", None),
        fsdp=getattr(args, "fsdp", False),
        fit_loop=getattr(args, "fit_loop", "device"),
        progress_every=getattr(args, "progress_every", None),
        log_every_step=getattr(args, "log_every_step", False),
        optimizer=getattr(args, "optimizer", "adamw"),
        aot_dir=(getattr(args, "aot_dir", None) or None),
        stage1_wave_ckpt=getattr(args, "stage1_wave_ckpt", None),
        stage1_time_ckpt=getattr(args, "stage1_time_ckpt", None),
        stage1_joint_ckpt=getattr(args, "stage1_joint_ckpt", None),
        log_fn=log_fn,
    )

    results = run_pipeline(cfg)

    le = results["label_encoder"]
    label_names = le.classes_
    final_metrics = {}
    for kind, info in results["best"].items():
        final_metrics[f"best_balanced_accuracy_{kind}"] = info["balanced_accuracy"]
        print(f"best_balanced_accuracy_{kind}: {info['balanced_accuracy']:.4f} (k={info['k']})")
        fig = make_confmat(info["confusion_matrix"], label_names, info["k"])
        fig_path = os.path.join(args.output_dir, f"{args.dataset}_confusion_matrix_{kind}.png")
        fig.savefig(fig_path, dpi=150, bbox_inches="tight")
        print(f"saved {fig_path}")
        if wandb_shim.is_enabled():
            wandb.log({f"{args.dataset}_confusion_matrix_{kind}": wandb.Image(fig)})

    if wandb_shim.is_enabled():
        wandb.log(final_metrics)
        for path in results["paths"].values():
            if isinstance(path, str):
                wandb.log_artifact(path, name=os.path.basename(path), type=os.path.basename(path))
        if args.upload_model:
            for m, path in results["supervised_checkpoints"].items():
                wandb.log_artifact(
                    path,
                    name=f"{m}_model_ft_d{args.dataset}_z{args.z_dim}_lr{args.learning_rate}.pt",
                    type="model",
                )
        wandb.config.update(args)
    return results


if __name__ == "__main__":
    run(build_parser().parse_args())

"""Hyperparameter sweep in ONE compiled program (vmapped ensemble).

Sweeps K learning rates (or K seeds) of the stage-1 cVAE pretrain
simultaneously via train/ensemble.py: every replica trains in the same
jitted epoch program, sharing one trace/compile, one dispatch stream, and
one process setup — on remote-TPU deployments those dominate wall-clock
(RESULTS.md), so K configs cost far less than K full runs.

The reference has no sweep tooling at all (wandb sweeps are config-only,
never used — SURVEY.md §5); this is rebuild surplus built on the same data
and model contract as scripts/train_model.py.

Usage:
    python scripts/lr_sweep.py --dataset cellexplorer-celltype \
        --lrs 1e-2,3e-3,1e-3,3e-4 --max-epochs 40 --patience 10
    python scripts/lr_sweep.py --dataset X --mode seeds --n-seeds 4 --lr 1e-3

Prints a per-config table and one final JSON line for scripting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hippie_tpu.data import device_data
from hippie_tpu.models import cvae
from hippie_tpu.train import ensemble, optim, pipeline, step


def build_parser():
    p = argparse.ArgumentParser(
        prog="hippie-tpu lr-sweep", description=__doc__.splitlines()[0]
    )
    p.add_argument("--dataset", required=True, help="target dataset name")
    p.add_argument("--data-root", default="datasets")
    p.add_argument("--modality", choices=("wave", "time", "joint"), default="wave",
                   help="wave/time: unimodal cVAE on one data array; joint: "
                        "the MultiModalCVAE on paired (wave, isi) rows — its "
                        "exported winner feeds train_model_with_multimodal "
                        "--stage1-joint-ckpt")
    p.add_argument("--pool", choices=("pretrain", "self"), default="pretrain",
                   help="pretrain: leave-target-out pool (stage-1 contract); "
                        "self: the target dataset's own rows")
    p.add_argument("--mode", choices=("lr", "seeds"), default="lr",
                   help="lr: one shared init, one replica per --lrs entry; "
                        "seeds: --n-seeds independent inits at --lr")
    p.add_argument("--lrs", default="1e-2,3e-3,1e-3,3e-4",
                   help="comma-separated learning rates (mode=lr)")
    p.add_argument("--lr", type=float, default=1e-3, help="lr for mode=seeds")
    p.add_argument("--n-seeds", type=int, default=4)
    p.add_argument("--z-dim", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--max-epochs", type=int, default=40)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--mod1-weight", type=float, default=1.0,
                   help="joint sweeps only: waveform loss weight — match the "
                        "--mod1-weight the pipeline will train stages 2-3 "
                        "with, or the sweep objective diverges from it")
    p.add_argument("--mod2-weight", type=float, default=1.0,
                   help="joint sweeps only: ISI loss weight (see --mod1-weight)")
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--clip-val", type=float, default=None,
                   help="global-norm clip; default mirrors the reference's "
                        "Q7 asymmetry (wave: none, time: 1.0)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--train-frac", type=float, default=0.8)
    p.add_argument("--num-blocks", default="2,2,2,2",
                   help="backbone blocks per stage (tests use 1,1,1,1)")
    p.add_argument("--fit-loop", choices=("device", "host"), default="device",
                   help="device: the whole K-replica sweep runs as ONE "
                        "on-device while_loop (one dispatch + one fetch total "
                        "— the host loop pays ~3 round trips PER EPOCH on "
                        "remote backends); host: per-epoch loop, live prints")
    p.add_argument("--progress-every", type=int, default=None,
                   help="device loop only: run in epoch chunks of this size "
                        "for live progress (identical trajectory)")
    p.add_argument("--aot-dir", default=os.path.join(
        os.path.expanduser("~"), ".cache", "hippie_tpu_aot"),
        help="compiled-program cache for the device fit loop; '' disables")
    p.add_argument("--resume-dir", default=None, metavar="DIR",
                   help="orbax crash-resume dir for the sweep (device loop "
                        "only): the K-replica fit saves its stacked state + "
                        "per-replica bests each epoch and an interrupted "
                        "sweep resumes bit-equal to an uninterrupted run")
    p.add_argument("--export-winner", default=None, metavar="CKPT",
                   help="write the winning replica as a Lightning stage-1 "
                        "checkpoint; feed it to the pipeline via "
                        "train_model --stage1-{wave,time}-ckpt (or, for "
                        "--modality joint, train_model_with_multimodal "
                        "--stage1-joint-ckpt) to train stages 2-3 from the "
                        "swept winner")
    p.add_argument("--export-all", default=None, metavar="PREFIX",
                   help="write EVERY replica's best snapshot as "
                        "PREFIX<k>.ckpt (not just the val winner): pool "
                        "validation loss is a poor selector for downstream "
                        "transfer (RESULTS.md round 5 — the best-val lr "
                        "sweep winner refits WORSE than a higher-val "
                        "candidate), so screen each candidate with "
                        "`hippie-tpu kfold --refit` instead")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    clip_val = args.clip_val
    if clip_val is None and args.modality in ("time", "joint"):
        clip_val = 1.0  # reference Q7: time/multimodal trainers clip, wave does not

    cfg = pipeline.PipelineConfig(
        dataset=args.dataset, data_root=args.data_root, verbose=False,
    )
    ds = (pipeline.load_pretrain_pool(cfg) if args.pool == "pretrain"
          else pipeline.load_dataset(cfg, args.dataset))
    joint = args.modality == "joint"
    if not joint and (args.mod1_weight != 1.0 or args.mod2_weight != 1.0):
        raise SystemExit("lr-sweep: --mod1-weight/--mod2-weight only apply to "
                         "--modality joint")
    if joint:
        arrays = (ds.wave, ds.isi)
    else:
        arrays = (ds.wave if args.modality == "wave" else ds.isi,)
    n = int(arrays[0].shape[0])

    if n < 2:
        raise ValueError(f"need at least 2 rows to split train/val, got {n}")
    root = jax.random.PRNGKey(args.seed)
    perm = np.asarray(jax.random.permutation(jax.random.fold_in(root, 0), n))
    # Validation must be disjoint from train: when train_frac rounds to the
    # full dataset, shrink the train split by one row instead of scoring a
    # training row as "validation".
    n_train = min(max(1, int(args.train_frac * n)), n - 1)
    tr_idx, va_idx = perm[:n_train], perm[n_train:]

    # Same geometry the pipeline's stage-1 models use (pipeline.py stage 1:
    # num_sources=registry.NUM_SOURCES, num_classes=5) so an exported winner
    # seeds stages 2-3 directly.
    from hippie_tpu.data import registry

    nb_cfg = tuple(int(x) for x in args.num_blocks.split(","))
    if joint:
        cfg_m = cvae.MultiModalConfig(
            z_dim=args.z_dim,
            output_size_wave=int(arrays[0].shape[1]),
            output_size_isi=int(arrays[1].shape[1]),
            num_sources=registry.NUM_SOURCES, num_classes=5,
            num_blocks=nb_cfg,
        )
        init_one = cvae.multimodal_cvae_init
        init_ens = ensemble.init_multimodal_ensemble
    else:
        cfg_m = cvae.CVAEConfig(
            z_dim=args.z_dim, output_size=int(arrays[0].shape[1]),
            num_sources=registry.NUM_SOURCES, num_classes=5,
            num_blocks=nb_cfg,
        )
        init_one = cvae.unimodal_cvae_init
        init_ens = ensemble.init_unimodal_ensemble

    if args.mode == "lr":
        lrs = [float(x) for x in args.lrs.split(",")]
        K = len(lrs)
        labels = [f"lr={x:g}" for x in lrs]
        tx = optim.make_optimizer(lrs[0], args.weight_decay, clip_val=clip_val)
        # one shared init so only lr differs between replicas
        p0, s0 = init_one(jax.random.fold_in(root, 1), cfg_m)
        bcast = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), t)
        params, bn = bcast(p0), bcast(s0)
        opt_state = jax.vmap(tx.init)(params)
        ts = step.TrainState(params, bn, ensemble.set_ensemble_lr(opt_state, lrs))
    else:
        K = args.n_seeds
        lrs = [args.lr] * K
        labels = [f"seed[{k}] lr={args.lr:g}" for k in range(K)]
        tx = optim.make_optimizer(args.lr, args.weight_decay, clip_val=clip_val)
        ts = init_ens(jax.random.fold_in(root, 1), cfg_m, tx, K)

    va_plan = device_data.batch_plan(va_idx, args.batch_size, shuffle=False)
    va_plan = (jnp.asarray(va_plan[0]), jnp.asarray(va_plan[1]))

    print(f"sweeping {K} configs on {args.dataset} ({args.pool} pool, "
          f"{args.modality}, {n} rows, {jax.devices()[0].platform}, "
          f"{args.fit_loop} loop)")
    if args.fit_loop == "device":
        # The whole sweep is ONE dispatch (train/ensemble.device_fit_ensemble)
        # — a K=4 x 40-epoch host loop pays ~120 round trips this kills.
        if joint:
            batch_step, eval_step = step.make_multimodal_steps(
                tx, beta=args.beta,
                mod1_weight=args.mod1_weight, mod2_weight=args.mod2_weight)
        else:
            batch_step, eval_step = step.make_unimodal_steps(tx, beta=args.beta)
        res = ensemble.device_fit_ensemble(
            ts, batch_step=batch_step, eval_step=eval_step,
            arrays=arrays, source=ds.source, class_=None,
            train_stream=tr_idx, batch_size=args.batch_size,
            val_idx=va_plan[0], val_mask=va_plan[1], val_nb=va_plan[0].shape[0],
            max_epochs=args.max_epochs,
            early_stopping_patience=args.patience, seed=args.seed,
            shuffle=True, aot_dir=(args.aot_dir or None),
            # Baked-in traced constants MUST be in the cache key: beta lives
            # inside batch_step/eval_step, wd/clip inside tx (clip_by_global_norm
            # bakes the value; None-vs-set only changes the treedef). Omitting
            # them would silently replay a prior sweep's program with the old
            # constants (same arg shapes -> same key). Mirrors _aot_cfg_desc +
            # aot_extra="clip=..." in train/pipeline.py.
            aot_desc=(f"lrsweep|{args.modality}|z={args.z_dim}|"
                      f"nb={args.num_blocks}|beta={args.beta}|"
                      f"wd={args.weight_decay}|clip={clip_val}"
                      + (f"|m1={args.mod1_weight}|m2={args.mod2_weight}"
                         if joint else "")),
            progress_every=args.progress_every, verbose=True,
            resume_dir=args.resume_dir,
        )
    else:
        if args.resume_dir:
            raise SystemExit("lr-sweep: --resume-dir requires --fit-loop device")
        if joint:
            raise SystemExit(
                "lr-sweep: --modality joint requires --fit-loop device (the "
                "host epoch loop is unimodal-only; the device loop is the "
                "default and supports live prints via --progress-every)")
        data = arrays[0]
        e_train, e_eval = ensemble.make_unimodal_ensemble_epoch_fns(tx, beta=args.beta)

        def run_train(s, key, epoch):
            # Same key split as pipeline.run_train (fold_in 0: plan shuffle,
            # fold_in 1: reparameterization noise) over the canonical bucketed
            # plan — the device loop generates the identical plan in-device,
            # so the two loops stay on one trajectory.
            idx, mask, nb = device_data.host_epoch_plan(
                tr_idx, args.batch_size, True, jax.random.fold_in(key, 0))
            return e_train(s, data, ds.source, None, jnp.asarray(idx[:nb]),
                           jnp.asarray(mask[:nb]), jax.random.fold_in(key, 1))

        def run_val(s, key, epoch):
            return e_eval(s.params, s.bn_state, data, ds.source, None,
                          va_plan[0], va_plan[1], key)

        res = ensemble.fit_ensemble(
            ts, run_train_epoch=run_train, run_val_epoch=run_val,
            max_epochs=args.max_epochs, early_stopping_patience=args.patience,
            seed=args.seed, verbose=True,
        )

    # A replica that never logged a finite best (diverged-at-val, or inf from
    # never improving) must not win: np.argmin would return the first nan.
    finite = np.isfinite(res.best_val_loss)
    if not finite.any():
        print(json.dumps({
            "dataset": args.dataset, "modality": args.modality,
            "mode": args.mode, "configs": labels, "lrs": lrs,
            "best_val_loss": [float(x) for x in res.best_val_loss],
            "error": "no replica produced a finite validation loss",
        }))
        raise SystemExit("lr-sweep: no replica produced a finite validation loss")
    best_k = int(np.argmin(np.where(finite, res.best_val_loss, np.inf)))
    print(f"\n{'config':>18} {'best val':>12} {'best epoch':>10}")
    for k in range(K):
        mark = " <- best" if k == best_k else ""
        print(f"{labels[k]:>18} {res.best_val_loss[k]:12.6f} "
              f"{int(res.best_epoch[k]):10d}{mark}")

    exported_all = None
    if args.export_all:
        from hippie_tpu.train import checkpoint as ckpt_mod
        from hippie_tpu.train.pipeline import _ordering_template

        template = _ordering_template(cfg_m, multimodal=joint)
        exported_all = []
        for k in range(K):
            path = f"{args.export_all}{k}.ckpt"
            ckpt_mod.save_lightning_ckpt(
                path,
                ckpt_mod.reorder_like(template[0],
                                      ensemble.take_replica(res.best_params, k)),
                ckpt_mod.reorder_like(template[1],
                                      ensemble.take_replica(res.best_bn_state, k)),
                epoch=int(res.best_epoch[k]),
                hyper_parameters={
                    "lr": float(lrs[k]),
                    "best_val_loss": float(res.best_val_loss[k]),
                    "config": labels[k], "modality": args.modality,
                },
            )
            exported_all.append(path)
        print(f"exported all {K} replicas -> {args.export_all}{{0..{K-1}}}.ckpt")

    exported = None
    if args.export_winner:
        # Winner replica -> Lightning stage-1 ckpt. Dict key order inside
        # vmap/jit is key-sorted; restore torch registration order against an
        # eval_shape template exactly like the pipeline (CLAUDE.md invariant).
        from hippie_tpu.train import checkpoint as ckpt_mod
        from hippie_tpu.train.pipeline import _ordering_template

        template = _ordering_template(cfg_m, multimodal=joint)
        bp = ensemble.take_replica(res.best_params, best_k)
        bbn = ensemble.take_replica(res.best_bn_state, best_k)
        ckpt_mod.save_lightning_ckpt(
            args.export_winner,
            ckpt_mod.reorder_like(template[0], bp),
            ckpt_mod.reorder_like(template[1], bbn),
            epoch=int(res.best_epoch[best_k]),
            hyper_parameters={
                "lr": float(lrs[best_k]),
                "best_val_loss": float(res.best_val_loss[best_k]),
                "sweep": labels, "modality": args.modality,
            },
        )
        exported = args.export_winner
        print(f"exported winner ({labels[best_k]}) -> {exported}")

    print(json.dumps({
        "dataset": args.dataset, "modality": args.modality, "mode": args.mode,
        "configs": labels, "lrs": lrs,
        "best_val_loss": [float(x) for x in res.best_val_loss],
        "best_epoch": [int(x) for x in res.best_epoch],
        "epochs_run": res.epochs_run,
        "winner": labels[best_k], "winner_lr": lrs[best_k],
        "exported": exported, "exported_all": exported_all,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

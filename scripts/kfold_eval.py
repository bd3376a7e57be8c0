"""K-fold cross-validated KNN evaluation of trained embeddings.

The reference ships a stratified k-fold generator (hippie/utils.py:42-70,
``generate_kfolds``) that no shipped script ever calls; this CLI makes the
evident intent usable: embed a labeled dataset with trained checkpoints,
then report the balanced-accuracy KNN sweep (k = 5..19, the reference's
grid, train_model.py:415-440) as mean ± std across
StratifiedKFold(shuffle, seed 42) folds instead of the pipeline's single
train/val split.

Embeddings are extracted once on device (honest mode: no class
conditioning), and every fold's sweep runs through ONE compiled KNN program:
folds are padded to a common shape with far-away sentinel rows that can
never enter a top-k neighborhood, so the 10-fold sweep costs 10 dispatches,
zero recompiles.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KS = tuple(range(5, 20, 2))  # the reference's sweep grid
_SENTINEL = 1e15  # rows at this coordinate are never among the k nearest


def build_parser():
    parser = argparse.ArgumentParser(
        description="k-fold cross-validated KNN evaluation of trained embeddings")
    parser.add_argument("--dataset", type=str, default="cellexplorer-celltype")
    parser.add_argument("--data-root", type=str, default="datasets")
    parser.add_argument("--wave-checkpoint", type=str, default=None)
    parser.add_argument("--time-checkpoint", type=str, default=None)
    parser.add_argument("--joint-checkpoint", type=str, default=None,
                        help="a MultiModalCVAE checkpoint instead of the dual pair")
    parser.add_argument("--folds", type=int, default=10,
                        help="StratifiedKFold splits (reference default 10)")
    parser.add_argument("--output-dir", type=str, default="./kfold_eval")
    parser.add_argument("--drop-index-column", action="store_true",
                        help="exclude the pandas index column (quirk Q4 fix)")
    parser.add_argument("--seed", type=int, default=42)
    return parser


def _fold_sweep(emb, labels, folds, num_classes):
    """Balanced accuracy per (fold, k); one compiled program for all folds."""
    from hippie_tpu.evaluate import knn_eval, metrics

    max_tr = max(len(tr) for tr, _ in folds)
    max_va = max(len(va) for _, va in folds)
    per_k = {k: [] for k in KS}
    for tr, va in folds:
        tr_x = np.full((max_tr, emb.shape[1]), _SENTINEL, np.float32)
        tr_y = np.zeros((max_tr,), np.int32)
        tr_x[: len(tr)] = emb[tr]
        tr_y[: len(tr)] = labels[tr]
        va_x = np.zeros((max_va, emb.shape[1]), np.float32)
        va_x[: len(va)] = emb[va]
        preds = knn_eval.knn_predict_sweep(tr_x, tr_y, va_x, ks=KS,
                                           num_classes=num_classes)
        for k in KS:
            per_k[k].append(
                metrics.balanced_accuracy_score(labels[va], preds[k][: len(va)]))
    return per_k


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.joint_checkpoint is None and (
            args.wave_checkpoint is None or args.time_checkpoint is None):
        build_parser().error(
            "provide --wave-checkpoint and --time-checkpoint, or --joint-checkpoint")

    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import pandas as pd

    from hippie_tpu import export as hexport
    from hippie_tpu.data import registry
    from hippie_tpu.evaluate import embeddings as emb_mod
    from hippie_tpu.evaluate.kfolds import stratified_kfold_indices

    os.makedirs(args.output_dir, exist_ok=True)
    wf, isi = registry.load_raw(args.data_root, args.dataset,
                                drop_index_column=args.drop_index_column)
    from hippie_tpu.ops import preprocess

    wave, isi_p = preprocess.preprocess_pair(jnp.asarray(wf), jnp.asarray(isi))
    labels, le = registry.load_supervised_labels(args.data_root, args.dataset)
    labels = np.asarray(labels)
    num_classes = int(len(np.unique(labels)))
    smallest = int(np.bincount(labels).min())
    folds = stratified_kfold_indices(labels, args.folds, seed=args.seed)
    folds = [(tr, va) for tr, va in folds if len(va)]
    print(f"{args.dataset}: {len(labels)} rows, {num_classes} classes "
          f"(smallest {smallest}), {len(folds)} folds")

    # Resolve the dataset's source ID the way training did: registry.json
    # pins + directory discovery (a custom dataset trained via
    # --discover-datasets has a persisted ID there; embedding it with a
    # default of 0 would condition on the wrong source and skew every
    # reported accuracy).
    registry.discover_datasets(args.data_root)
    src_id = registry.DATASET_SOURCE_IDS.get(args.dataset, 0)

    kinds = {}
    if args.joint_checkpoint is not None:
        p, s, cfg = hexport.load_model_from_ckpt(args.joint_checkpoint, multimodal=True)
    else:
        pw, sw, cfg = hexport.load_model_from_ckpt(args.wave_checkpoint, multimodal=False)
        pt, st, _ = hexport.load_model_from_ckpt(args.time_checkpoint, multimodal=False)
    if src_id >= cfg.num_sources:
        print(f"WARNING: source id {src_id} for {args.dataset} exceeds the "
              f"model's source-embedding table ({cfg.num_sources}); using "
              f"{src_id % cfg.num_sources} (the inference CLI's convention)")
        src_id %= cfg.num_sources
    source = jnp.full((len(labels),), src_id, jnp.int32)
    if args.joint_checkpoint is not None:
        kinds["joint"] = np.asarray(
            emb_mod.embed_multimodal(p, s, wave, isi_p, source))
    else:
        kinds["waveform"] = np.asarray(emb_mod.embed_unimodal(pw, sw, wave, source))
        kinds["isi"] = np.asarray(emb_mod.embed_unimodal(pt, st, isi_p, source))
        kinds["joint"] = np.hstack([kinds["waveform"], kinds["isi"]])
    print(f"model geometry: z_dim={cfg.z_dim}, num_sources={cfg.num_sources}")

    rows = []
    for kind, emb in kinds.items():
        per_k = _fold_sweep(emb, labels, folds, num_classes)
        best_k = max(KS, key=lambda k: float(np.mean(per_k[k])))
        print(f"{kind}: best mean balanced accuracy "
              f"{np.mean(per_k[best_k]):.4f} ± {np.std(per_k[best_k]):.4f} (k={best_k})")
        for k in KS:
            accs = per_k[k]
            rows.append({"kind": kind, "k": k,
                         "mean_balanced_accuracy": float(np.mean(accs)),
                         "std_balanced_accuracy": float(np.std(accs)),
                         "folds": len(accs)})
    out_path = os.path.join(args.output_dir, f"{args.dataset}_kfold_knn.csv")
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()

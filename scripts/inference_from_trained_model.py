"""Inference CLI (contract of reference scripts/inference_from_trained_model.py).

Loads a dataset + dual wave/time checkpoints, exports
<output-dir>/<ds>_{waveform,isi,joint}_embeddings.csv (index=False, with
label / label_name columns) and UMAP visualizations when umap-learn is
installed. Adds optional on-device k-means clustering of the joint embeddings
(--cluster) — the train-to-cluster single-accelerator pass.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--z_dim", type=int, default=64, required=False,
                        help="Dimensionality of the latent space")
    parser.add_argument("--dataset", type=str, default="cellexplorer-celltype",
                        help="Dataset to perform inference on")
    parser.add_argument("--wave-checkpoint", type=str, default=None,
                        help="Path to the waveform model checkpoint")
    parser.add_argument("--time-checkpoint", type=str, default=None,
                        help="Path to the time model checkpoint")
    parser.add_argument("--joint-checkpoint", type=str, default=None,
                        help="Path to a joint MultiModalCVAE checkpoint (instead of the dual "
                             "wave/time checkpoints); exports joint embeddings only")
    parser.add_argument("--output-dir", type=str, default="./embeddings",
                        help="Directory to save embeddings and visualizations")
    parser.add_argument("--data-root", type=str, default="datasets")
    parser.add_argument("--num-sources", type=int, default=5)
    parser.add_argument("--cluster", type=int, default=0,
                        help="If >0, also cluster the joint embeddings on device with this many clusters")
    parser.add_argument("--cluster-method", type=str, choices=["kmeans", "gmm"], default="kmeans",
                        help="On-device clustering algorithm for --cluster")
    parser.add_argument("--seed", type=int, default=42)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.joint_checkpoint is None and (args.wave_checkpoint is None or args.time_checkpoint is None):
        build_parser().error("provide --wave-checkpoint and --time-checkpoint, or --joint-checkpoint")

    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from hippie_tpu.data import registry
    from hippie_tpu.evaluate import embeddings as emb
    from hippie_tpu.models import cvae
    from hippie_tpu.ops import preprocess
    from hippie_tpu.train import checkpoint as ckpt_mod

    os.makedirs(args.output_dir, exist_ok=True)

    print(f"Loading dataset: {args.dataset}")
    wf, isi = registry.load_raw(args.data_root, args.dataset, dropna=True)
    wave, isi_p = preprocess.preprocess_pair(jnp.asarray(wf), jnp.asarray(isi))

    # Labels from metadata.csv 'label' column, else dummy zeros
    # (reference inference_from_trained_model.py:69-82).
    labels = None
    label_names = None
    meta = registry.load_metadata(args.data_root, args.dataset)
    if meta is not None and "label" in meta.columns:
        labels = meta["label"].to_numpy()
        label_names = meta["label"].unique()
        print(f"Found {len(label_names)} unique labels: {label_names}")
    if labels is None:
        labels = np.zeros(wf.shape[0], dtype=np.int64)
        label_names = ["unknown"]
        print("No labels found, using dummy labels")

    num_classes = len(np.unique(labels))

    print("Loading models from checkpoints...")
    joint_mode = args.joint_checkpoint is not None
    # Resolved model geometry: inferred from the checkpoint's own weight
    # shapes when possible (export.infer_*_config — works for ours and for
    # reference-trained ckpts alike), falling back to the CLI flags. The
    # reference instead hardcodes z_dim=64 / num_sources=5 defaults that
    # mismatch most real checkpoints (inference…py:16-22,97).
    z_dim, num_sources = args.z_dim, args.num_sources
    class_hidden_dim, num_blocks = 5, (2, 2, 2, 2)

    def load_tree(sd, template, model_name):
        """Load a state_dict into a template, with the reference's
        class-embedding mismatch healing (inference…py:116-127) and a
        skipped-keys warning (a non-empty skip beyond the intentional drop
        means the checkpoint's architecture doesn't match the requested
        config — z_dim/num_blocks)."""
        drop = ()
        ce = sd.get("model.class_embedding.weight")
        if ce is not None and ce.shape[0] != num_classes:
            print(f"Warning: Class embedding size mismatch in {model_name} model. Removing from checkpoint.")
            drop = ("class_embedding.weight",)
        params, bn, loaded, skipped = ckpt_mod.from_torch_state_dict(
            sd, template[0], template[1], drop_keys=drop
        )
        if skipped:
            print(f"Warning: {len(skipped)} checkpoint keys did not match the "
                  f"{model_name} model architecture and were skipped (e.g. {skipped[0]}); "
                  f"check --z_dim and the model config.")
        return params, bn

    try:
        from hippie_tpu import export as hexport

        trees = {}
        if joint_mode:
            payload = ckpt_mod.load_lightning_ckpt(args.joint_checkpoint)
            sd = payload["state_dict"]
            try:
                base = hexport.infer_multimodal_config(sd)
                z_dim, num_sources = base.z_dim, base.num_sources
                class_hidden_dim, num_blocks = base.class_hidden_dim, base.num_blocks
                print(f"Model geometry from checkpoint: z_dim={z_dim}, "
                      f"num_sources={num_sources}, num_blocks={list(num_blocks)}")
            except (KeyError, ValueError, IndexError):
                pass  # non-standard keys: trust the flags
            mm_cfg = cvae.MultiModalConfig(
                z_dim=z_dim, class_hidden_dim=class_hidden_dim,
                num_sources=num_sources, num_classes=num_classes,
                num_blocks=tuple(num_blocks),
            )
            template = cvae.multimodal_cvae_init(jax.random.PRNGKey(0), mm_cfg)
            trees["joint"] = load_tree(sd, template, "joint")
        else:
            payloads = {
                "wave": ckpt_mod.load_lightning_ckpt(args.wave_checkpoint),
                "time": ckpt_mod.load_lightning_ckpt(args.time_checkpoint),
            }
            try:
                base = hexport.infer_unimodal_config(payloads["wave"]["state_dict"])
                z_dim, num_sources = base.z_dim, base.num_sources
                class_hidden_dim, num_blocks = base.class_hidden_dim, base.num_blocks
                print(f"Model geometry from checkpoint: z_dim={z_dim}, "
                      f"num_sources={num_sources}, num_blocks={list(num_blocks)}")
            except (KeyError, ValueError, IndexError):
                pass
            for name, out_size in (("wave", 50), ("time", 100)):
                cfg_m = cvae.CVAEConfig(
                    z_dim=z_dim, output_size=out_size, class_hidden_dim=class_hidden_dim,
                    num_sources=num_sources, num_classes=num_classes,
                    num_blocks=tuple(num_blocks),
                )
                template = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg_m)
                trees[name] = load_tree(payloads[name]["state_dict"], template, name)
        print("Models loaded successfully")
    except Exception as e:
        print(f"Error loading models: {e}")
        sys.exit(1)

    # The reference passes the (1-D) labels straight through get_embeddings,
    # where they act as *source* labels in the forward (scripts/utils.py:79).
    lab_arr = np.asarray(labels)
    try:
        lab_codes = lab_arr.astype(np.int64)
    except (ValueError, TypeError):
        # Non-integer labels (quirk Q12: the reference assumes integer codes
        # and would crash here too); encode to stable integer codes so the
        # source-conditioning pass-through still works.
        lab_codes = registry.LabelEncoder.fit(lab_arr).transform(lab_arr)
    source = jnp.asarray(lab_codes % num_sources, jnp.int32)

    print("Extracting embeddings...")
    if joint_mode:
        joint_emb = np.asarray(
            emb.embed_multimodal(trees["joint"][0], trees["joint"][1], wave, isi_p, source)
        )
        wave_emb = isi_emb = None
    else:
        wave_emb, isi_emb, joint_emb = emb.get_embeddings(
            trees["wave"], trees["time"], wave, isi_p, source
        )

    print("Saving embeddings...")
    kinds = [("waveform", wave_emb), ("isi", isi_emb), ("joint", joint_emb)]
    kinds = [(k, a) for k, a in kinds if a is not None]
    for kind, arr in kinds:
        df = pd.DataFrame(arr)
        df["label"] = labels
        try:
            df["label_name"] = pd.Categorical(
                [np.asarray(label_names)[int(i)] for i in labels]
            )
        except (ValueError, IndexError, TypeError):
            # Non-integer-coded labels (reference assumes integer codes,
            # quirk Q12); fall back to the labels themselves.
            df["label_name"] = pd.Categorical(np.asarray(labels).astype(str))
        out_path = os.path.join(args.output_dir, f"{args.dataset}_{kind}_embeddings.csv")
        df.to_csv(out_path, index=False)
        print(f"Saved {kind} embeddings to {out_path}")

    if args.cluster > 0:
        from hippie_tpu.ops import clustering

        if args.cluster_method == "gmm":
            assign, means, var, weights, ll = clustering.gmm(
                jnp.asarray(joint_emb), args.cluster, seed=args.seed
            )
            detail = f"log-likelihood={float(ll):.4f}"
        else:
            assign, centers, inertia = clustering.kmeans(
                jnp.asarray(joint_emb), args.cluster, seed=args.seed
            )
            detail = f"inertia={float(inertia):.4f}"
        df = pd.DataFrame({"cluster": np.asarray(assign)})
        df["label"] = labels
        out_path = os.path.join(args.output_dir, f"{args.dataset}_joint_clusters.csv")
        df.to_csv(out_path, index=False)
        print(f"Saved {args.cluster_method} clusters (k={args.cluster}, {detail}) to {out_path}")

    # 2-D visualizations: UMAP when umap-learn is installed (reference
    # behavior), else a PCA projection so plots always exist.
    try:
        import umap  # noqa: F401

        have_umap = True
    except ImportError:
        have_umap = False
        print("umap-learn not installed; falling back to PCA projections")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _proj_cache = {}  # kind -> (points, method): a UMAP fit costs minutes at
    # scale, and the comparison figure reuses the per-kind projections.

    def project_2d(embeddings, kind):
        if kind in _proj_cache:
            return _proj_cache[kind]
        if have_umap:
            out = umap.UMAP(random_state=42).fit_transform(embeddings), "UMAP"
        else:
            x = np.asarray(embeddings, np.float64)
            x = x - x.mean(axis=0)
            _, _, vt = np.linalg.svd(x, full_matrices=False)
            out = x @ vt[:2].T, "PCA"
        _proj_cache[kind] = out
        return out

    def create_plot(embeddings, labels, title, output_path, kind):
        u, method = project_2d(embeddings, kind)
        plt.figure(figsize=(10, 8))
        if len(np.unique(labels)) > 1:
            sc = plt.scatter(u[:, 0], u[:, 1], c=labels, cmap="tab10", alpha=0.7, s=10)
            plt.colorbar(sc, label="Label")
        else:
            plt.scatter(u[:, 0], u[:, 1], alpha=0.7, s=10)
        plt.title(title)
        plt.xlabel(f"{method} 1")
        plt.ylabel(f"{method} 2")
        plt.tight_layout()
        plt.savefig(output_path, dpi=300, bbox_inches="tight")
        plt.close()

    print("Generating 2-D visualizations...")
    for kind, arr in kinds:
        out_path = os.path.join(args.output_dir, f"{args.dataset}_{kind}_umap.png")
        # color by the integer label CODES: matplotlib's c= rejects strings
        create_plot(arr, lab_codes, f"{args.dataset} {kind} embeddings", out_path, kind)
        print(f"Saved {kind} visualization to {out_path}")

    # 3-panel modality comparison (reference: inference…py:195-220); pointless
    # with a single modality (joint-checkpoint mode).
    if labels is not None and len(np.unique(labels)) > 1 and len(kinds) > 1:
        print("Generating comparison plots...")
        fig, axs = plt.subplots(1, len(kinds), figsize=(6 * len(kinds), 6), squeeze=False)
        axs = axs[0]
        for idx, (kind, arr) in enumerate(kinds):
            u, method = project_2d(arr, kind)
            sc = axs[idx].scatter(u[:, 0], u[:, 1], c=lab_codes, cmap="tab10", alpha=0.7, s=10)
            axs[idx].set_title(f"{kind} embeddings")
            axs[idx].set_xlabel(f"{method} 1")
            axs[idx].set_ylabel(f"{method} 2")
        fig.colorbar(sc, ax=axs, label="Label")
        out_path = os.path.join(args.output_dir, f"{args.dataset}_comparison_umap.png")
        plt.savefig(out_path, dpi=300, bbox_inches="tight")
        plt.close()
        print(f"Saved comparison visualization to {out_path}")

    print("Inference completed successfully!")


if __name__ == "__main__":
    main()

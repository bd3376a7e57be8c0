"""`hippie-tpu` console entry point: train / train-multimodal / infer / bench.

A working replacement for the reference's declared-but-missing `hippie-cli`
(reference pyproject.toml:53-54 points at a module that does not exist).
Subcommands delegate to the same code paths as the scripts/ CLIs.
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: hippie-tpu {train,train-multimodal,sweep,lr-sweep,infer,kfold,serve,export,synth,bench} [args...]\n"
            "  train            3-stage unimodal pipeline (scripts/train_model.py flags)\n"
            "  train-multimodal unimodal-or-joint pipeline (--model-type multimodal)\n"
            "  sweep            full pipeline for every dataset target in ONE process\n"
            "  lr-sweep         K learning rates / seeds trained in ONE vmapped program\n"
            "  infer            dual-checkpoint embedding export (+ --cluster k)\n"
            "  kfold            k-fold cross-validated KNN evaluation of embeddings\n"
            "  serve            HTTP embedding microservice (POST /embed)\n"
            "  export           checkpoint -> deployable StableHLO artifact\n"
            "  synth            generate a synthetic dataset in the CSV contract\n"
            "  bench            print the headline throughput benchmark JSON line"
        )
        return 0
    cmd, rest = argv[0], argv[1:]
    import os

    scripts_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, scripts_dir)
    if cmd == "train":
        from train_model import build_parser, run

        run(build_parser().parse_args(rest))
    elif cmd == "train-multimodal":
        import train_model_with_multimodal as m

        sys.argv = ["train_model_with_multimodal.py"] + rest
        m.main()
    elif cmd == "sweep":
        import sweep_targets as m

        return m.main(rest) or 0
    elif cmd == "lr-sweep":
        import lr_sweep as m

        return m.main(rest) or 0
    elif cmd == "infer":
        import inference_from_trained_model as m

        m.main(rest)
    elif cmd == "kfold":
        import kfold_eval as m

        m.main(rest)
    elif cmd == "serve":
        import serve_embeddings as m

        m.main(rest)
    elif cmd == "export":
        import export_model as m

        m.main(rest)
    elif cmd == "synth":
        import argparse

        from hippie_tpu.data import synth

        p = argparse.ArgumentParser(prog="hippie-tpu synth")
        p.add_argument("--data-root", default="datasets")
        p.add_argument("--name", required=True)
        p.add_argument("--n", type=int, default=256)
        p.add_argument("--wave-width", type=int, default=46)
        p.add_argument("--isi-width", type=int, default=100)
        p.add_argument("--num-classes", type=int, default=3)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--with-metadata", action="store_true")
        a = p.parse_args(rest)
        path = synth.make_dataset(
            a.data_root, a.name, n=a.n, wave_width=a.wave_width, isi_width=a.isi_width,
            num_classes=a.num_classes, seed=a.seed, with_metadata=a.with_metadata,
        )
        print(f"wrote synthetic dataset to {path}")
    elif cmd == "bench":
        import runpy

        runpy.run_path(
            os.path.join(os.path.dirname(scripts_dir), "bench.py"), run_name="__main__"
        )
    else:
        print(f"unknown command: {cmd}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

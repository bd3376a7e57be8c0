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
            "usage: hippie-tpu {train,train-multimodal,infer,serve,bench} [args...]\n"
            "  train            3-stage unimodal pipeline (scripts/train_model.py flags)\n"
            "  train-multimodal unimodal-or-joint pipeline (--model-type multimodal)\n"
            "  infer            dual-checkpoint embedding export (+ --cluster k)\n"
            "  serve            HTTP embedding microservice (POST /embed)\n"
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
    elif cmd == "infer":
        import inference_from_trained_model as m

        m.main(rest)
    elif cmd == "serve":
        import serve_embeddings as m

        m.main(rest)
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

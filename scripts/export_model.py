"""Export a trained checkpoint as a deployable StableHLO artifact.

    python scripts/export_model.py --checkpoint ckpts/<ds>_wave_model.ckpt \
        --output wave_embedder.hippie [--platforms cpu,tpu]

The artifact loads in a fresh process with hippie_tpu.export.load_artifact —
no torch, no Lightning checkpoint parsing, no retrace (the reference's
inference path needs all three; inference_from_trained_model.py:100-131).
Model geometry is inferred from the checkpoint's tensor shapes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="Lightning .ckpt (wave or time model)")
    p.add_argument("--output", required=True, help="artifact path (zip: manifest.json + model.shlo)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets baked into the artifact")
    p.add_argument("--precision", choices=("highest", "default"), default="highest",
                   help="matmul precision baked into the artifact: 'highest' is the "
                        "fp32-exact parity contract; 'default' lets the TPU multiply "
                        "in bf16 for higher serving throughput (measured drift and "
                        "rows/s in RESULTS.md; no effect on cpu)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from hippie_tpu import export as hexport

    manifest = hexport.export_from_checkpoint(
        args.checkpoint, args.output,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s.strip()),
        precision=args.precision,
    )
    size = os.path.getsize(args.output)
    print(f"exported {args.checkpoint} -> {args.output} ({size/1e6:.1f} MB)")
    print(manifest)


if __name__ == "__main__":
    main()

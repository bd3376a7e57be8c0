"""Unimodal-or-multimodal 3-stage training CLI (contract of reference
scripts/train_model_with_multimodal.py).

Adds --model-type {unimodal,multimodal}, --mod1-weight, --mod2-weight on top
of the train_model.py flag set. The multimodal path trains a single joint
two-encoder/two-decoder cVAE on paired (waveform, ISI) batches — working here,
unlike the reference whose shipped multimodal path crashes at dataset
construction (quirk Q3: EphysDatasetLabeled rejects mode="both").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_model import build_parser, run  # noqa: E402


def main():
    parser = build_parser()
    parser.set_defaults(project="HIPPIE")
    parser.add_argument(
        "--model-type", type=str, choices=["unimodal", "multimodal"], default="unimodal",
        help="Whether to use separate models for each modality or a joint model",
    )
    parser.add_argument("--mod1-weight", type=float, default=1.0,
                        help="Weight for the waveform modality loss in multimodal model")
    parser.add_argument("--mod2-weight", type=float, default=1.0,
                        help="Weight for the ISI modality loss in multimodal model")
    parser.add_argument("--stage1-joint-ckpt", type=str, default=None,
                        help="seed the joint model from this Lightning stage-1 ckpt and "
                             "skip its pretrain fit (e.g. an `hippie-tpu lr-sweep "
                             "--modality joint --export-winner` output); geometry must "
                             "match --z-dim/--num-blocks")
    args = parser.parse_args()
    run(args, model_type=args.model_type)


if __name__ == "__main__":
    main()

"""Run the full 3-stage pipeline for EVERY dataset target in one process.

    python scripts/sweep_targets.py [--datasets a,b,c] [train_model.py flags]

One process means cross-target reuse of everything expensive on this stack:
traced/lowered programs (the shape-bucketed stage fits accept any dataset
whose padded shapes land in the same buckets), the persistent compile cache,
and the device-resident preprocessing pipeline. The reference has no
equivalent — each of its runs is a fresh ~45-minute torch process per target.

Emits one summary JSON line per target (best KNN balanced accuracy per
embedding kind + wall seconds) and a final aggregate line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_model import build_parser  # noqa: E402  (scripts dir on path)


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--datasets", type=str, default=None,
                        help="comma-separated targets (default: every dataset "
                             "present under --data-root that is in the registry)")
    args = parser.parse_args(argv)

    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from hippie_tpu.data import registry

    if getattr(args, "discover_datasets", False):
        registry.discover_datasets(args.data_root)
    if args.datasets:
        targets = [s.strip() for s in args.datasets.split(",") if s.strip()]
    else:
        targets = [
            name for name in registry.DATASET_SOURCE_IDS
            if os.path.isfile(os.path.join(args.data_root, name, "waveforms.csv"))
        ]
    if not targets:
        print("no targets found", file=sys.stderr)
        return 2

    from train_model import run

    results = []
    for name in targets:
        t0 = time.perf_counter()
        args.dataset = name
        try:
            summary = run(args)
            accs = {
                kind: round(float(info["balanced_accuracy"]), 4)
                for kind, info in (summary.get("best") or {}).items()
            }
            rec = {"dataset": name, "ok": True, "wall_s": round(time.perf_counter() - t0, 1),
                   "best_balanced_accuracy": accs}
        except Exception as e:  # keep sweeping; report the failure
            rec = {"dataset": name, "ok": False, "wall_s": round(time.perf_counter() - t0, 1),
                   "error": f"{type(e).__name__}: {e}"}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if r["ok"]]
    print(json.dumps({
        "metric": "sweep_targets",
        "targets": len(results),
        "ok": len(ok),
        "total_wall_s": round(sum(r["wall_s"] for r in results), 1),
    }))
    return 0 if len(ok) == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())

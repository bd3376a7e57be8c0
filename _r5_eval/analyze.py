"""Paired-fold comparison across round-5 kfold runs (refit mode)."""
import sys
import numpy as np
import pandas as pd

BASELINES = {"sup": "_r5_eval/kfold_base_sup", "pool": "_r5_eval/kfold_base"}

def folds_csv(d):
    return pd.read_csv(f"{d}/cellexplorer-celltype_kfold_knn_folds.csv")

def best_row(df, kind):
    sub = df[(df["mode"] == "refit") & (df["kind"] == kind)]
    if not len(sub):
        return None, None
    k = sub.groupby("k")["balanced_accuracy"].mean().idxmax()
    return sub[sub["k"] == k].sort_values("fold")["balanced_accuracy"].values, k

def main(candidate, baseline="pool"):
    b = folds_csv(BASELINES[baseline]); c = folds_csv(candidate)
    for kind in ("waveform", "isi", "joint"):
        bb, bk = best_row(b, kind); cc, ck = best_row(c, kind)
        if bb is None or cc is None:
            continue
        d = cc - bb
        sem = d.std(ddof=1) / np.sqrt(len(d))
        print(f"{kind:9s}: base({baseline}) {bb.mean():.4f}(k={bk})  "
              f"cand {cc.mean():.4f}±{cc.std():.4f}(k={ck})  "
              f"paired {d.mean():+.4f}±{sem:.4f} t={d.mean()/sem if sem else 0:.2f}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "pool")

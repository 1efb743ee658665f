#!/usr/bin/env python
"""Per-fold Bayes-oracle ceilings for a corpus clone (VERDICT r4 items 1+2).

``make_corpus_clone.py`` writes a ``corpus_oracle.csv`` sidecar scoring every
page with the generator's own likelihood-ratio rule twice: *latent* (assigned
colors — the information ceiling) and *visible* (colors re-estimated from the
rendered pixels — a pixels-only rule; see ``cova_tpu/data/synthetic.py``).
This script averages those rows over each fold's ``test_imgs.txt``
(``/root/reference/splits/Fold-k/``, the verbatim protocol lists) so a
model's ``fold_wise_acc.csv`` score can be read against a measured ceiling
band per fold, exactly like the hard-synthetic sweeps' ``oracle_acc.csv``.

Usage:
  python scripts/corpus_oracle_summary.py --clone .corpus_clone \
      [--splits splits] [--folds 1 2 3 4 5]
"""

import argparse
import csv
import os
import sys

import numpy as np

COLS = ["price_latent", "title_latent", "image_latent",
        "price_visible", "title_visible", "image_visible"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clone", required=True)
    ap.add_argument("--splits", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "splits"))
    ap.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    args = ap.parse_args()

    by_id = {}
    with open(os.path.join(args.clone, "corpus_oracle.csv")) as f:
        for row in csv.DictReader(f):
            by_id[row["page_id"]] = np.array(
                [float(row[c]) for c in COLS]
            )

    print("fold  n_test  " + "  ".join("%-13s" % c for c in COLS))
    per_fold = []
    for k in args.folds:
        ids = np.loadtxt(
            os.path.join(args.splits, f"Fold-{k}", "test_imgs.txt"), str,
            ndmin=1,
        )
        missing = [i for i in ids if i not in by_id]
        if missing:
            print(f"Fold-{k}: {len(missing)} test ids missing from the "
                  f"oracle sidecar (e.g. {missing[:3]})", file=sys.stderr)
            return 1
        acc = np.stack([by_id[i] for i in ids]).mean(axis=0) * 100
        per_fold.append(acc)
        print(f"{k:>4}  {len(ids):>6}  "
              + "  ".join("%-13.1f" % a for a in acc))
    arr = np.stack(per_fold)
    mean, std = arr.mean(axis=0), arr.std(axis=0)
    print("mean over folds:")
    print("  oracle latent  P %.1f±%.1f T %.1f±%.1f I %.1f±%.1f" % (
        mean[0], std[0], mean[1], std[1], mean[2], std[2]))
    print("  oracle visible P %.1f±%.1f T %.1f±%.1f I %.1f±%.1f" % (
        mean[3], std[3], mean[4], std[4], mean[5], std[5]))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Dev tool: compute golden AP values for the reference's stored random COCO
fixture pair (test_lours/test_data/coco_dataset/{annotations,predictions}
_valid_random.json) by running the REFERENCE'S OWN evaluation kernels
(construct_matches_df, pr_curve, compute_average_precision from
lours/evaluation/detection/util.py) with the reference evaluator's exact
orchestration (detection_evaluator.py:554-650):

  1. matches: per-(image_id, category_id) construct_matches_df(min_iou=0)
  2. results: gt rows with matched-prediction confidence (0 for FN) + FP rows
  3. per category: pr_curve(min_iou=iou, 101-point recall reindex) -> AP

The printed table is hard-coded into ReferenceFixtureSpec as the golden the
Spark evaluator must reproduce. Usage: ref_ap_golden.py [iou ...]
"""
import json
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from ref_pr_oracle import load_util

DATA = "/root/reference/test_lours/test_data/coco_dataset"


def load_coco(path):
    with open(path) as f:
        doc = json.load(f)
    rows = []
    for a in doc["annotations"]:
        x, y, w, h = a["bbox"]
        rows.append({
            "id": a["id"], "image_id": a["image_id"],
            "category_id": a["category_id"],
            "box_x_min": float(x), "box_y_min": float(y),
            "box_width": float(w), "box_height": float(h),
            "confidence": float(a.get("score", 0.0)),
        })
    return pd.DataFrame(rows).set_index("id")


def main():
    util = load_util()
    ious = [float(x) for x in sys.argv[1:]] or [0.0, 0.2, 0.5]
    gt = load_coco(f"{DATA}/annotations_valid_random.json").drop(columns="confidence")
    preds = load_coco(f"{DATA}/predictions_valid_random.json")

    # 1. category-specific matches at min_iou=0 (compute_matches, lines 155-178)
    both = pd.concat([gt.assign(groundtruth=True),
                      preds.assign(groundtruth=False)])
    matches = (both.groupby(["image_id", "category_id"], group_keys=False)
               .apply(lambda g: util.construct_matches_df(g, min_iou=0)))

    # 2. results assembly (compute_precision_recall, lines 583-618)
    results = gt.reset_index(names="groundtruth_id")
    results = pd.merge(results, matches.dropna(subset=["groundtruth_id"]),
                       on="groundtruth_id")
    results["confidence"] = 0.0
    detected = results["prediction_id"].dropna()
    results.loc[~results["prediction_id"].isna(), "confidence"] = (
        preds.loc[detected, "confidence"].values)
    false_positive = matches.loc[matches["groundtruth_id"].isna(), "prediction_id"]
    results_fp = (preds.loc[false_positive].reset_index()
                  .rename(columns={"id": "prediction_id"}))
    results_fp = pd.merge(results_fp, matches[matches["groundtruth_id"].isna()],
                          on="prediction_id")
    results = pd.concat([results, results_fp], ignore_index=True)
    results["groundtruth"] = ~results["groundtruth_id"].isna()
    results = results.sort_values("confidence", ascending=False)

    # 3. per-category pr_curve + AP at each iou (lines 624-650)
    reindex = pd.Series(np.linspace(0, 1, 101), name="recall")
    print("category_id iou AP")
    for iou in ious:
        for cat, group in results.groupby("category_id"):
            pr = util.pr_curve(group, min_iou=iou, reindex_series=reindex)
            ap = util.compute_average_precision(pr)
            print(f"{cat} {iou} {ap:.9f}")


if __name__ == "__main__":
    main()

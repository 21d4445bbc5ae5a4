#!/usr/bin/env python3
"""Dev tool: run the reference pr_curve/AP kernel on a CSV of
(groundtruth,iou,confidence) rows to generate fidelity oracles for
ScalaTest. Usage: ref_pr_oracle.py file.csv min_iou [reindex]"""
import importlib.util, sys, types
import pandas as pd, numpy as np

def load_util():
    utils_pkg = types.ModuleType("lours.utils")
    utils_pkg.BBOX_COLUMN_NAMES = ["box_x_min","box_y_min","box_width","box_height"]
    lours = types.ModuleType("lours"); lours.__path__=[]
    ev = types.ModuleType("lours.evaluation"); ev.__path__=[]
    det = types.ModuleType("lours.evaluation.detection"); det.__path__=[]
    sys.modules.update({"lours":lours,"lours.utils":utils_pkg,
                        "lours.evaluation":ev,"lours.evaluation.detection":det})
    try: import sklearn  # noqa
    except ImportError:
        m = types.ModuleType("sklearn.metrics"); m.confusion_matrix=None
        sys.modules["sklearn"]=types.ModuleType("sklearn"); sys.modules["sklearn.metrics"]=m
    spec = importlib.util.spec_from_file_location(
        "lours.evaluation.detection.util",
        "/root/reference/lours/evaluation/detection/util.py")
    util = importlib.util.module_from_spec(spec)
    sys.modules["lours.evaluation.detection.util"]=util
    spec.loader.exec_module(util)
    return util

if __name__ == "__main__":
    util = load_util()
    res = pd.read_csv(sys.argv[1])
    min_iou = float(sys.argv[2])
    reindex = pd.Series(np.linspace(0,1,101), name="recall") if len(sys.argv)>3 else None
    out = util.pr_curve(res, min_iou=min_iou, reindex_series=reindex)
    print(out[["precision","recall","confidence_threshold"]].to_string())
    print("AP:", util.compute_average_precision(out))

#!/usr/bin/env python3
"""Reading-order-chain golden generator (driver-side tooling, NOT part of
the library).

Executes the reference's OWN routils functions (neighbor_utils, kde_utils,
paragraph/pinp/para_utils, new_read_order) from /root/reference on the
checked-in fixture box sets and writes per-stage expected outputs as JSON
under src/test/resources/golden/ro/. The Scala ports are then compared
stage-by-stage by ReadingOrderGoldenSpec.

The reference modules import cv2 / matplotlib / scipy / a CLI-args module
at import time; those are stubbed here:
 - cv2: visualisation only on this path -> no-op draws; imread returns a
   zero image of the registered page size (page_size() reads .shape).
 - matplotlib: visualisation only -> no-op.
 - scipy.stats.gaussian_kde: re-derived with numpy (same math: gaussian
   sum with factor^2 * sample-variance bandwidth); this derivation is
   already validated against the reference KDE by tools/gen_goldens.py /
   KdeSpec.
 - scipy.spatial.distance: euclidean/cityblock/chebyshev via numpy.
 - routils.global_utils: argparse at import time -> replaced by a
   SimpleNamespace with the parser's defaults (metric='euclidean').

Graph construction mirrors generate_graph_utils.create_graphs' edge rules
(add an undirected edge per non-[-1] directional link) without its
matplotlib plotting; component member lists are normalised to ascending
order (CPython set-iteration order is not a semantic).
"""
import io
import contextlib
import json
import math
import os
import sys
import types

import numpy as np
import pandas as pd
import networkx as nx

REF_ROUTILS = "/root/reference/server/modules/main/routils"
FIX = "/root/repo/src/test/resources/fixtures/merge_codes"
OUT = "/root/repo/src/test/resources/golden/ro"
os.makedirs(OUT, exist_ok=True)

# ---------------------------------------------------------------- stubs --
PAGE_DIMS = {}  # image filename -> (H, W)

cv2 = types.ModuleType("cv2")
cv2.imread = lambda f, *a: np.zeros(PAGE_DIMS.get(f, (3508, 2480)) + (3,), np.uint8)
for _fn in ("rectangle", "putText", "line", "imwrite", "circle"):
    setattr(cv2, _fn, lambda *a, **k: None)
cv2.cvtColor = lambda img, *a, **k: img
cv2.COLOR_BGR2RGB = 0
cv2.COLOR_RGB2BGR = 0
cv2.FONT_HERSHEY_SIMPLEX = 0
sys.modules["cv2"] = cv2

mpl = types.ModuleType("matplotlib")
plt = types.ModuleType("matplotlib.pyplot")
for _fn in ("plot", "show", "savefig", "imshow", "axis", "subplots",
            "tight_layout", "figure", "title", "close"):
    setattr(plt, _fn, lambda *a, **k: None)
mpl.pyplot = plt
sys.modules["matplotlib"] = mpl
sys.modules["matplotlib.pyplot"] = plt

scipy = types.ModuleType("scipy")
scipy_stats = types.ModuleType("scipy.stats")


class gaussian_kde:  # numpy re-derivation of the scipy estimator
    def __init__(self, dataset, bw_method=None):
        self.d = np.asarray(dataset, dtype=float)
        n = len(self.d)
        factor = bw_method if isinstance(bw_method, (int, float)) \
            else n ** (-1.0 / 5.0)  # Scott, d=1
        self.bw2 = factor * factor * self.d.var(ddof=1)

    def evaluate(self, xs):
        xs = np.asarray(xs, dtype=float)
        ys = np.exp(-((xs[:, None] - self.d[None, :]) ** 2)
                    / (2 * self.bw2)).sum(axis=1)
        return ys / (len(self.d) * math.sqrt(2 * math.pi * self.bw2))

    __call__ = evaluate


scipy_stats.gaussian_kde = gaussian_kde
scipy_spatial = types.ModuleType("scipy.spatial")
scipy_dist = types.ModuleType("scipy.spatial.distance")


def _euclidean(a, b):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    return float(np.sqrt(((a - b) ** 2).sum()))


scipy_dist.euclidean = _euclidean
scipy_dist.cityblock = lambda a, b: float(np.abs(np.asarray(a, float) - np.asarray(b, float)).sum())
scipy_dist.chebyshev = lambda a, b: float(np.abs(np.asarray(a, float) - np.asarray(b, float)).max())
scipy_dist.cdist = lambda A, B: np.sqrt((
    (np.asarray(A, float)[:, None, :] - np.asarray(B, float)[None, :, :]) ** 2).sum(-1))
scipy_spatial.distance = scipy_dist
scipy_signal = types.ModuleType("scipy.signal")


def _find_peaks(ys):
    """Plateau-midpoint local maxima — the scipy.signal.find_peaks default
    behaviour on 1-D data (same derivation as tools/gen_goldens.py, already
    validated against the reference KDE path)."""
    ys = np.asarray(ys, dtype=float)
    peaks = []
    i = 1
    last = len(ys) - 1
    while i < last:
        if ys[i - 1] < ys[i]:
            ahead = i + 1
            while ahead < last and ys[ahead] == ys[i]:
                ahead += 1
            if ys[ahead] < ys[i]:
                peaks.append((i + ahead - 1) // 2)
                i = ahead
            else:
                i = ahead
        else:
            i += 1
    return np.asarray(peaks, dtype=int), {}


scipy_signal.find_peaks = _find_peaks
scipy.__path__ = []  # mark as package so `from scipy.signal import ...` resolves
sys.modules["scipy"] = scipy
sys.modules["scipy.stats"] = scipy_stats
sys.modules["scipy.spatial"] = scipy_spatial
sys.modules["scipy.spatial.distance"] = scipy_dist
sys.modules["scipy.signal"] = scipy_signal

ultra = types.ModuleType("ultralytics")


class _YOLO:  # model inference is never reached on the golden path
    def __init__(self, *a, **k):
        raise RuntimeError("YOLO stubbed — not used by the golden chain")


ultra.YOLO = _YOLO
sys.modules["ultralytics"] = ultra

# ------------------------------------------------------- package loading --
import importlib.util

PKG = "routils"
pkg = types.ModuleType(PKG)
pkg.__path__ = [REF_ROUTILS]
sys.modules[PKG] = pkg

gu = types.ModuleType(f"{PKG}.global_utils")
gu.args = types.SimpleNamespace(metric="euclidean", para_only=False,
                                col_only=False)
sys.modules[f"{PKG}.global_utils"] = gu


def load(name):
    spec = importlib.util.spec_from_file_location(
        f"{PKG}.{name}", f"{REF_ROUTILS}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{PKG}.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


silent = contextlib.redirect_stdout(io.StringIO())
with silent:
    ku = load("kde_utils")
    load("dist_utils")
    pu = load("para_utils")
    load("pinp_utils")
    load("layout_filtering")
    nu = load("neighbor_utils")
    para = load("paragraph")
    nro = load("new_read_order")
    cu = load("column_utils")

# ------------------------------------------------------------- the chain --


def run_chain(name, boxes_xywh, page_w, page_h):
    """boxes: [(x,y,w,h)] in fixture order. Returns the per-stage golden."""
    img = f"{name}.jpg"
    PAGE_DIMS[img] = (page_h, page_w)
    xyxy = [[x, y, x + w, y + h] for (x, y, w, h) in boxes_xywh]

    df = pd.DataFrame({0: [list(b) for b in xyxy]})
    eu = pd.DataFrame()
    with contextlib.redirect_stdout(io.StringIO()):
        nu.calculate_center_points(df, eu)
        horizontal, vertical = nu.find_closest_neighbors(eu)
        x_thr = ku.kde_estimate_d(horizontal, "horizontal")
        y_thr = ku.kde_estimate_d(vertical, "vertical")
        nu.calculate_rightbox(eu, x_thr)
        nu.calculate_leftbox(eu, x_thr)
        nu.calculate_topbox(eu, y_thr)
        nu.calculate_bottombox(eu, y_thr)

    # graph + components (create_graphs' edge rules, no plotting)
    G = nx.Graph()
    for _, row in eu.iterrows():
        i = int(row["Id"])
        G.add_node(i)
        for c in ("Right_Box", "Left_Box", "Top_Box", "Bottom_Box"):
            if row[c][0] != -1:
                G.add_edge(i, int(row[c][1]))
    comps = [sorted(int(v) for v in c) for c in nx.connected_components(G)]
    target = [[c] for c in comps]

    with contextlib.redirect_stdout(io.StringIO()):
        before_pinp, after_pinp, _ = para.recognise_paragraphs(
            None, target, eu, img, 0, 0, 0, None)
        ordered = para.paragraph_order(after_pinp.copy())
        comp_sorted = ordered.sort_values("Order", kind="mergesort")
        _, regions = nro.get_final_word_order(comp_sorted, eu, img, "/tmp/ro_out", False)
        # W4: top-down/left-right paragraph sort (returns the component df)
        w4 = para.get_paragraph_order(after_pinp.copy(), img, "/tmp/ro_out")
        # W5-alt: chain walk with order incremented on re-seed
        w5 = cu.column_order(after_pinp.copy())
        # (get_col returns None in the reference — visualisation only — so
        # no golden is derivable for it; its port is source-pinned.)

    def link(v):
        return [round(float(v[0]), 6), int(v[1])]

    def para_rows(dfp, with_bb=False, with_order=False):
        out = []
        for _, r in dfp.iterrows():
            d = {
                "members": [int(m) for m in r["Component"][0]],
                "top": [round(float(r["Top"][0]), 6), round(float(r["Top"][1]), 6)],
                "bottom": [round(float(r["Bottom"][0]), 6), round(float(r["Bottom"][1]), 6)],
                "left": [round(float(r["Left"][0]), 6), round(float(r["Left"][1]), 6)],
                "right": [round(float(r["Right"][0]), 6), round(float(r["Right"][1]), 6)],
            }
            if with_bb:
                d["bottom_box"] = link(r["Bottom_Box"])
            if with_order:
                d["order"] = int(r["Order"])
            out.append(d)
        return out

    return {
        "pageW": page_w,
        "pageH": page_h,
        "boxes": [list(b) for b in boxes_xywh],
        "horizontal": [round(float(v), 6) for v in horizontal],
        "vertical": [round(float(v), 6) for v in vertical],
        "x": int(x_thr),
        "y": int(y_thr),
        "right": [link(v) for v in eu["Right_Box"]],
        "left": [link(v) for v in eu["Left_Box"]],
        "top": [link(v) for v in eu["Top_Box"]],
        "bottom": [link(v) for v in eu["Bottom_Box"]],
        "components": comps,
        "paras_before_pinp": para_rows(before_pinp),
        "paras_after_pinp": para_rows(after_pinp, with_bb=True),
        "paras_ordered": para_rows(ordered, with_bb=True, with_order=True),
        "w4_orders": [int(o) for o in w4["Order"]],
        "w5_column_orders": [int(o) for o in w5["Order"]],
        "regions": [
            {"x": r["bounding_box"]["x"], "y": r["bounding_box"]["y"],
             "w": r["bounding_box"]["w"], "h": r["bounding_box"]["h"],
             "order": r["order"], "line": r["line_number"]}
            for r in regions
        ],
    }


def fixture_boxes(name):
    with open(f"{FIX}/{name}.json") as f:
        data = json.load(f)
    return [(r["bounding_box"]["x"], r["bounding_box"]["y"],
             r["bounding_box"]["w"], r["bounding_box"]["h"])
            for r in data[0]["regions"]]


# margin-filter golden with NONZERO margins (the chain runs margins=0):
# build the before-pinp paragraph table, then apply ignore_margins at
# width 10% / header 10% / footer 10% on the fixture page.
def margin_golden(name, before_rows, page_w, page_h):
    img = f"{name}_margins.jpg"
    PAGE_DIMS[img] = (page_h, page_w)
    dfp = pd.DataFrame({
        "Component": [[r["members"]] for r in before_rows],
        "Id": list(range(len(before_rows))),
        "Top": [r["top"] for r in before_rows],
        "Bottom": [r["bottom"] for r in before_rows],
        "Right": [r["right"] for r in before_rows],
        "Left": [r["left"] for r in before_rows],
    })
    with contextlib.redirect_stdout(io.StringIO()):
        kept = pu.ignore_margins(dfp, 10, 10, 10, img)
    return [int(i) for i in kept["Id"]]


results = {}
for name, dims in [("ajoy", (2480, 3508)), ("openseg", (2480, 3508)),
                   ("craft", (2480, 3508))]:
    boxes = fixture_boxes(name)
    g = run_chain(name, boxes, dims[0], dims[1])
    g["margins_kept_ids"] = margin_golden(name, g["paras_before_pinp"],
                                          dims[0], dims[1])
    with open(f"{OUT}/{name}.json", "w") as f:
        json.dump(g, f)
    results[name] = (len(boxes), len(g["components"]),
                     len(g["paras_after_pinp"]), len(g["regions"]),
                     g["x"], g["y"])

for k, v in results.items():
    print(k, "boxes=%d comps=%d paras=%d regions=%d x=%d y=%d" % v)
print("goldens written to", OUT)

#!/usr/bin/env python3
"""Golden-output generator (driver-side tooling, NOT part of the library).

Runs the reference's own pure-Python merge/ordering algorithms on the
checked-in fixture region sets and writes the expected outputs as JSON
under src/test/resources/golden/. The Scala ports are then byte-compared
against these goldens by the ScalaTest suite.

The reference algorithm files are executed from their original location
(/root/reference) — nothing is copied into the repo; only the *outputs*
(expected data) are persisted.
"""
import json
import math
import os
import sys

REF = "/root/reference/server/modules/main"
FIX = "/root/repo/src/test/resources/fixtures/merge_codes"
OUT = "/root/repo/src/test/resources/golden"

os.makedirs(OUT, exist_ok=True)


def load_fixture(name):
    with open(f"{FIX}/{name}.json") as f:
        return json.load(f)


import copy


def regions_of(data, image_name="page.jpg"):
    """Re-key to a common image name so the merges actually align.
    Deep-copies: the reference algorithms mutate their inputs in place,
    so every golden must start from pristine fixtures."""
    return [{"image_name": image_name,
             "regions": copy.deepcopy(data[0]["regions"])}]


def strip(regions):
    """Semantic payload for comparison: bbox + order + line."""
    return [
        {
            "bounding_box": r["bounding_box"],
            "order": r.get("order", -1),
            "line": r.get("line", 0),
        }
        for r in regions
    ]


def exec_reference(path, start_marker, names):
    """Exec the pure-function tail of a reference module (skipping its
    framework imports) and return the requested callables."""
    with open(path) as f:
        src = f.read()
    idx = src.index(start_marker)
    g = {"defaultdict": __import__("collections").defaultdict,
         "json": json, "os": os}
    exec(src[idx:], g)
    return [g[n] for n in names]


# --- 2-set merge family (helper.py) ---------------------------------------
(merge2, assign_orders, resolve_dups, remove_smaller) = exec_reference(
    f"{REF}/helper.py",
    "def boxes_overlap_adjusted",
    ["merge_all_regions_with_stats", "assign_orders_based_on_neighbors",
     "resolve_duplicate_orders", "remove_smaller_overlapping_regions"],
)

ajoy = load_fixture("ajoy")
openseg = load_fixture("openseg")
craft = load_fixture("craft")
lehal = load_fixture("lehal")

# Full 2-way pipeline (merge -> assign -> remove -> resolve), aligned names.
# helper.merge_all_regions_with_stats has a debug print(); silence it.
import io, contextlib
# merge_all_regions_with_stats runs assign/remove/resolve internally
# (helper.py:310-312) — its output IS the full 2-way pipeline.
with contextlib.redirect_stdout(io.StringIO()):
    union, *_ = merge2(regions_of(ajoy), regions_of(openseg))
with open(f"{OUT}/merge2_ajoy_openseg.json", "w") as f:
    json.dump(strip(union[0]["regions"]), f)

# Stage goldens on deterministic inputs -----------------------------------
# assign_orders: craft regions with every 5th order zeroed
craft_mod = [dict(copy.deepcopy(r), order=(0 if i % 5 == 0 else r["order"]))
             for i, r in enumerate(craft[0]["regions"])]
data = [{"image_name": "p", "regions": [dict(r) for r in craft_mod]}]
assign_orders(data)
with open(f"{OUT}/assign_orders_craft.json", "w") as f:
    json.dump(strip(data[0]["regions"]), f)

# remove_smaller on lehal
data = [{"image_name": "p", "regions": copy.deepcopy(lehal[0]["regions"])}]
remove_smaller(data)
with open(f"{OUT}/remove_smaller_lehal.json", "w") as f:
    json.dump(strip(data[0]["regions"]), f)

# resolve_duplicate_orders: openseg with orders floor-divided by 3 (ties)
os_mod = [dict(copy.deepcopy(r), order=r["order"] // 3) for r in openseg[0]["regions"]]
data = [{"image_name": "p", "regions": os_mod}]
resolve_dups(data)
with open(f"{OUT}/resolve_dups_openseg.json", "w") as f:
    json.dump(strip(data[0]["regions"]), f)

# --- 3-set merges ---------------------------------------------------------
sys.path.insert(0, f"{REF}/processors/merge_codes")
import merge_ajoy_openseg_craft as m3
import merge_ajoy_openseg_craft_v3 as m3v3

res3 = m3.merge_all_regions(regions_of(ajoy), regions_of(openseg), regions_of(craft))
with open(f"{OUT}/merge3_ajoy_openseg_craft.json", "w") as f:
    json.dump(strip(res3[0]["regions"]), f)

res3v = m3v3.merge_3_new(regions_of(ajoy), regions_of(openseg), regions_of(craft))
with open(f"{OUT}/merge3v3_ajoy_openseg_craft.json", "w") as f:
    json.dump(strip(res3v[0]["regions"]), f)

# --- KDE goldens (independent numpy re-derivation of scipy KDE) -----------
import numpy as np

def kde_curve(data, factor):
    data = np.asarray(data, dtype=float)
    n = len(data)
    var = data.var(ddof=1)
    bw2 = factor * factor * var
    xs = np.linspace(data.min(), data.max(), 1000)
    ys = np.exp(-((xs[:, None] - data[None, :]) ** 2) / (2 * bw2)).sum(axis=1)
    ys /= n * math.sqrt(2 * math.pi * bw2)
    return xs, ys

def kde_estimate(data, factor):
    xs, ys = kde_curve(data, factor)
    return math.ceil(xs[int(np.argmax(ys))])

def find_peaks(ys):
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
    return peaks

def kde_para(data):
    data = np.asarray(data, dtype=float)
    factor = len(data) ** (-1.0 / 5.0)
    xs, ys = kde_curve(data, factor)
    peaks = find_peaks(ys)
    if not peaks:
        idx = int(np.argmax(ys))
    elif len(peaks) < 2:
        idx = peaks[0]
    else:
        order = sorted(peaks, key=lambda p: (-ys[p], -p))
        idx = order[1]
    return math.ceil(xs[idx])

# deterministic pseudo-distance samples (LCG; no RNG-library dependence)
def lcg(seed, n, lo, hi):
    out = []
    s = seed
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(lo + (s >> 11) / float(1 << 53) * (hi - lo))
    return out

kde_cases = []
for seed, n, lo, hi in [(42, 200, 0.0, 40.0), (7, 50, 5.0, 15.0),
                        (99, 500, 0.0, 100.0), (3, 10, 1.0, 4.0)]:
    data = lcg(seed, n, lo, hi)
    kde_cases.append({
        "seed": seed, "n": n, "lo": lo, "hi": hi,
        "estimate01": kde_estimate(data, 0.1),
        "estimateH": kde_estimate(data, n ** (-1.0 / 5.0)),
        "para": kde_para(data),
    })
with open(f"{OUT}/kde_cases.json", "w") as f:
    json.dump(kde_cases, f)

# --- A8 4-edge dilate goldens (post_helper.process_region) ----------------
# Executes the reference's own process_region on crafted ink grids; the
# pydantic Region is replaced by a minimal shim with the same to_xyxy /
# from_xyxy surface (the function uses nothing else).


class ShimRegion:
    def __init__(self, xyxy, line=0, label=""):
        self.xyxy = tuple(int(v) for v in xyxy)
        self.line = line
        self.label = label

    def to_xyxy(self):
        return self.xyxy

    @classmethod
    def from_xyxy(cls, t, line=0, label=""):
        return cls(t, line, label)


def load_process_region():
    with open("/root/reference/server/modules/main/post_helper.py") as f:
        src = f.read()
    start = src.index("def process_region")
    end = src.index("def process_dilate")
    g = {"Region": ShimRegion}
    exec(src[start:end], g)
    return g["process_region"]


process_region = load_process_region()

dilate_cases = []
GRID_W, GRID_H = 60, 40


def run_dilate(ink_boxes, probe):
    img = np.zeros((GRID_H, GRID_W), dtype=np.int64)
    for (x, y, w, h) in ink_boxes:
        img[y:y + h, x:x + w] = 1
    out = process_region(img, ShimRegion(probe))
    return list(out.to_xyxy())


for ink, probe in [
    # isolated box: every edge expands exactly 1 to the first blank strip
    ([(10, 10, 8, 6)], (10, 10, 18, 16)),
    # two horizontally-touching boxes: left expansion crosses the partner
    ([(10, 10, 8, 6), (18, 10, 8, 6)], (18, 10, 26, 16)),
    # vertical stack touching: top/bottom expansion crosses the partner
    ([(10, 10, 8, 6), (10, 16, 8, 6)], (10, 16, 18, 22)),
    # box at the left page edge, blank elsewhere: x1 walks to -1 (numpy
    # negative index probes the blank last column and stops)
    ([(0, 10, 5, 6)], (0, 10, 5, 16)),
    # L-shaped ink around the probe: multi-step expansion on two edges
    ([(10, 10, 20, 4), (10, 14, 4, 10)], (20, 11, 24, 13)),
]:
    dilate_cases.append({
        "ink": [list(b) for b in ink],
        "probe": list(probe),
        "expected": run_dilate(ink, probe),
        "gridW": GRID_W,
        "gridH": GRID_H,
    })
with open(f"{OUT}/dilate_cases.json", "w") as f:
    json.dump(dilate_cases, f)

print("goldens written to", OUT)
for fn in sorted(os.listdir(OUT)):
    print(" ", fn, os.path.getsize(f"{OUT}/{fn}"))


#!/usr/bin/env python3
"""Summarize the round-12 scale-tier soak (tools/scale_soak.sh).

Reads the per-tier Bench JSON lines from target/scale/ and emits a
markdown report with per-entry scaling exponents:

    exponent = ln(t_hi / t_lo) / ln(scale_factor)

Linear work reads as ~1.0, pruned/indexed paths as ~0.0, and anything
materially above 1 is a scale bug to chase. Entries below a floor time
at BOTH scales are reported but not graded (fixed overhead dominates,
the ratio is meaningless noise).

Stdlib only — this is an analysis tool, not part of the library.
"""
import json
import math
import os
import sys

# expectation classes: what exponent SHOULD this entry show, and why.
# graded against the measured exponent with a tolerance band.
EXPECT = {
    # near-flat: pruned / indexed / fixed-size paths
    "engine_point_lookups_x20": (0.0, "extent-pruned point lookups"),
    "engine_point_lookups_hot": (0.0, "chunk-byte LRU hit"),
    "engine_merge_many_arrays": (0.0, "fixed 100-array delta, merge cost ~ change"),
    "engine_rect_spj": (0.0, "fixed 96-chunk grids, cube-independent"),
    "engine_repo_push_incr": (0.0, "no-op re-push: one listing anti-join"),
    # sub-linear by geometry: slices scale with a face, not the volume
    "engine_cube_slice_read": (0.67, "slice cells ~ cube^2 (face) vs volume cube^3"),
    "engine_rect_slice_read": (0.67, "boundary rows ~ face"),
    "engine_cube_slice_rows": (0.33, "fixed 64-row band x cube"),
    "engine_values_diff": (0.67, "4 edited chunks; chunk bytes ~ cube^2"),
    # everything else defaults to ~linear
}
DEFAULT_EXPECT = (1.0, "work ~ data")
# gate queries whose in-query exact-audit side is quadratic BY DESIGN
# (documented in SURVEY; the production op is separately timed)
QUADRATIC_OK = {"q_ann_neighbors"}
FLOOR_SEC = 0.35   # below this at both scales: overhead-dominated
TOL = 0.45         # |measured - expected| within this = PASS


def load(out_dir, name):
    p = os.path.join(out_dir, name + ".json")
    if not os.path.exists(p) or os.path.getsize(p) == 0:
        return None
    with open(p) as f:
        return json.load(f)


def section(lines, title, lo, hi, factor):
    lines.append(f"\n## {title} (scale factor {factor}x)\n")
    if lo is None or hi is None:
        lines.append("MISSING TIER DATA — soak incomplete for this pair\n")
        return []
    lines.append(f"calib lo={lo['queries'].get('engine_calib', 'n/a')} "
                 f"hi={hi['queries'].get('engine_calib', 'n/a')} "
                 f"(box-weather brackets; raws in raws_*.json)\n")
    lines.append("| entry | t_lo (s) | t_hi (s) | ratio | exponent | expected | verdict |")
    lines.append("|---|---|---|---|---|---|---|")
    bad = []
    keys = [k for k in lo["queries"] if k != "engine_calib"]
    for k in keys:
        tl, th = lo["queries"].get(k), hi["queries"].get(k)
        if th is None:
            lines.append(f"| {k} | {tl:.3f} | MISSING | | | | **missing at scale** |")
            bad.append(k)
            continue
        if tl <= 0 or th <= 0:
            lines.append(f"| {k} | {tl} | {th} | | | | **errored** |")
            bad.append(k)
            continue
        ratio = th / tl
        exp = math.log(ratio) / math.log(factor)
        want, why = EXPECT.get(k, DEFAULT_EXPECT)
        if tl < FLOOR_SEC and th < FLOOR_SEC:
            verdict = "ungraded (sub-floor both scales)"
        elif k in QUADRATIC_OK and exp > want + TOL:
            verdict = "by-design quadratic audit side"
        elif exp <= want + TOL:
            verdict = "PASS"
        else:
            verdict = f"**SUPERLINEAR vs {why}**"
            bad.append(k)
        lines.append(f"| {k} | {tl:.3f} | {th:.3f} | {ratio:.2f}x | "
                     f"{exp:.2f} | ~{want:.2f} ({why}) | {verdict} |")
    return bad


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "target/scale"
    lines = ["# Scale-tier soak report (round 12)",
             "",
             "Pairs run at matched section composition; exponent = "
             "ln(t_hi/t_lo)/ln(factor). ~1.0 = linear, ~0 = pruned/flat."]
    bad = []
    bad += section(lines, "Query family: sf0.1 -> sf1",
                   load(out_dir, "q1x"), load(out_dir, "q10x"), 10)
    bad += section(lines, "Refs family: 500k -> 5M refs (sections refs,pub)",
                   load(out_dir, "e1x_refs"), load(out_dir, "e10x_refs"), 10)
    bad += section(lines, "Cube family: 512^3 -> 1024^3 (section cube)",
                   load(out_dir, "e1x_cube"), load(out_dir, "e8x_cube"), 8)
    lines.append("\n## Verdict\n")
    if bad:
        lines.append("Investigate: " + ", ".join(sorted(set(bad))))
    else:
        lines.append("No superlinear entries; pruned paths stayed flat.")
    print("\n".join(lines))


if __name__ == "__main__":
    main()

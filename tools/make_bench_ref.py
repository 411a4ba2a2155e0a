#!/usr/bin/env python3
"""Record tools/bench_ref.json from a fresh Bench artifact, storing
CONTROLS-NORMALIZED per-query medians.

Why (VERDICT r10 #4): successive "idle" reference runs were recorded at
box_factor 0.688-0.936 — the anchor itself wandered with the box, so tier-1
normalization occasionally under-corrected. This tool divides every median
of the new artifact by the recording run's OWN box factor (median ratio of
the anchor controls against the PREVIOUS reference's normalized medians),
so successive references stay on one transitive scale anchored to the
original idle recording, regardless of the box state at re-record time.

Usage:
  make_bench_ref.py BENCH.json [--out tools/bench_ref.json]
      [--anchor q01_scan,q22_minhash_lsh,q57_curation_strict]
      [--controls q01_scan,q22_minhash_lsh,q57_curation_strict,q89_leakfree_containment]

--anchor: controls whose CODE is unchanged between the previous reference
and this artifact (they carry the scale across the transition). Drop a
control from the anchor for one re-record when its query code changed; it
re-enters the controls block at its new normalized value.

Refuses to record when the anchor ratios disagree by >1.5x (a selective
slowdown is polluting the factor — re-run the bench on a quieter box).
"""
import json
import subprocess
import sys
import time

DEFAULT_ANCHOR = ["q01_scan", "q22_minhash_lsh", "q57_curation_strict"]
DEFAULT_CONTROLS = DEFAULT_ANCHOR + ["q89_leakfree_containment"]


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d


def main(argv):
    out = "tools/bench_ref.json"
    anchor, controls = DEFAULT_ANCHOR, DEFAULT_CONTROLS
    for flag in ("--out", "--anchor", "--controls"):
        if flag in argv:
            i = argv.index(flag)
            v = argv[i + 1]
            if flag == "--out":
                out = v
            elif flag == "--anchor":
                anchor = v.split(",")
            else:
                controls = v.split(",")
            argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        print(__doc__)
        return 2
    new = load(argv[1])
    nq = {q: m for q, m in new["queries"].items() if m > 0}

    try:
        prev = load(out)
    except (OSError, ValueError):
        prev = None
    # previous normalized medians: new format carries them in "queries"
    # already normalized; a legacy full-artifact ref's raw medians DEFINE
    # the scale (normalized := raw at the original recording)
    prev_q = prev["queries"] if prev else {}

    shared = [c for c in anchor if c in nq and c in prev_q]
    if prev and len(shared) < len(anchor):
        print(f"WARN anchor controls missing from prev ref or artifact: "
              f"{sorted(set(anchor) - set(shared))}")
    if shared:
        ratios = sorted(nq[c] / prev_q[c] for c in shared)
        if ratios[-1] > ratios[0] * 1.5:
            print(f"REFUSE: anchor ratios disagree >1.5x "
                  f"({dict((c, round(nq[c] / prev_q[c], 3)) for c in shared)})"
                  f" — selective interference; re-run on a quieter box")
            return 1
        box = ratios[len(ratios) // 2]
    else:
        box = 1.0  # first recording defines the scale

    norm = {q: round(m / box, 3) for q, m in sorted(nq.items())}
    missing = [c for c in controls if c not in norm]
    if missing:
        print(f"REFUSE: controls {missing} not in artifact")
        return 1
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True).stdout.strip()
    except OSError:
        commit = "?"
    ref = {
        "queries": norm,
        "controls": {c: norm[c] for c in controls},
        "provenance": {
            "recorded": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "commit": commit,
            "source_artifact_total": new.get("value"),
            "box_factor_at_record": round(box, 3),
            "anchor": shared or anchor,
            "n_queries": len(norm),
            "sf": new.get("sf"),
            "env": new.get("env"),
            "note": "per-query medians divided by box_factor_at_record; "
                    "scale is transitive to the original idle recording",
        },
    }
    with open(out, "w") as f:
        json.dump(ref, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(norm)} queries, box_factor {box:.3f}, "
          f"controls {ref['controls']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

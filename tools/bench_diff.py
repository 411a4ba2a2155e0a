#!/usr/bin/env python3
"""Grade a new bench artifact against a previous round under per-family
regression budgets (BASELINE.md "Regression budgets").

Usage: python3 tools/bench_diff.py NEW.json OLD.json [--json OUT.json]

NEW/OLD may be either a bare Bench.scala line ({"metric":"total",...}) or a
driver wrapper ({..., "parsed": {...}}). Exit code 1 iff any family exceeds
its budget without a recorded rationale AND is classified "code".

A regression inside the per-query noise band (new median <= old median +
NOISE_SEC) never counts: at sf0.1 most queries run in a few hundred ms where
scheduler jitter dominates. When the new artifact carries a "stats" block
(round >= 5), the band widens to the measured max-min spread of that query.

Environment-vs-code classification (round 10+): the sandbox box degrades
under driver co-activity (NOTES rounds 6/9; the r9 driver run recorded
q51 at 13.5 s where two committed code-identical runs bracketing it show
1.9 s). A family over budget is therefore re-tested under three
progressively stronger environment hypotheses before it can fail the run:

 1. uniform slowdown — divide the new family sum by the control-query
    box_factor (the artifact's "controls" block, or computed here from its
    q01/q22/q57 medians vs the committed idle reference);
 2. transient interference — re-sum the family using each query's run
    MINIMUM (a code regression is deterministic work and slows every run;
    interference spares some), still against the old medians;
 3. idle-box reference — if tools/bench_ref.json (a committed, provenance-
    stamped idle run) holds this family within budget against the same old
    artifact, the regression is not reproducible on an idle box.

A family that escapes under a hypothesis is labeled "environment:<tier>";
only families failing all three are "code" and affect the exit code.
"""
import json
import os
import sys

# Control queries: normalized medians from the committed reference's
# "controls" block (round 11+: bench_ref.json stores box-factor-normalized
# medians — see make_bench_ref.py — and includes a heavy-shuffle control so
# the factor tracks the queries it corrects). The constants below are only
# the fallback for grading against a legacy full-artifact reference, and
# must then match Bench.scala's controlRef.
FALLBACK_CONTROLS = {"q01_scan": 0.072, "q22_minhash_lsh": 1.207,
                     "q57_curation_strict": 1.387,
                     "q89_leakfree_containment": 0.485}
REF_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_ref.json")

# Allowed family-median growth ratio round-over-round. A family is a set of
# queries that share an execution shape, so a real regression moves the
# whole family or is large enough to move its sum.
BUDGETS = {
    "cdc": 1.30,          # q01-q07, q33 — tiny fixed-cost queries
    "relational": 1.25,   # q08-q17, q30/q31, q34-q39, q62
    "dedup": 1.30,        # q18, q21-q23, q40, q45, q49, q58
    "similarity": 1.30,   # q20*, q24*, q54
    "text": 1.25,         # q19, q25-q28, q41, q43, q44, q51, q52, q60
    "prep": 1.25,         # q42, q46-q48, q50, q53, q55, q56
    "curation": 1.25,     # q26/q32/q57 composition
    "sketch": 1.30,       # q16b, q34b, q59
    "multimodal": 1.30,   # q29
    "expectations": 1.25,  # q138/q139 audits + keyed/row-level/rolled family
}
NOISE_SEC = 0.15

# Intentional semantic upgrades: query -> recorded rationale. A listed query
# is excluded from its family sum for ONE round and must be re-baselined (or
# the entry removed) the round after — this is the "recorded before/after
# rationale instead of a silent regression" mechanism from VERDICT r4 #8.
EXCEPTIONS = {
    # r4->r5 example (resolved): q22 went 1.06->3.03 s when candidate
    # estimates were replaced by LSH-pruned + exact-verified pairs; r5
    # restored <= ~2 s. Keep this dict empty when nothing is in flight.
    #
    # r5->r6 (resolved, entry retired round 10): q66 semDedup's
    # corpus-derived k (ceil(n/64)) — sampled training clawed the cost
    # back by r6 (1.8 s) and every artifact since grades it in-family.
}


def family(q):
    n = q.split("_")[0].lstrip("q")
    try:
        i = int(n.rstrip("bc"))
    except ValueError:
        return "relational"
    if i <= 7 or i in (33, 123, 130, 133):
        return "cdc"
    if i in (18, 21, 22, 23, 40, 45, 49, 58, 64, 86, 87, 95, 98, 101, 106, 109, 112, 114, 115, 122, 125, 128, 129, 131):
        return "dedup"
    if i in (20, 24, 54, 61, 66, 69, 70, 72, 99, 100, 102, 118, 124, 140, 148, 149):
        return "similarity"
    if i in (19, 25, 26, 27, 28, 41, 43, 44, 51, 52, 60, 65, 67, 77, 79, 80, 82, 96, 97, 107, 113, 116, 119, 144):
        return "text"
    if i in (42, 46, 47, 48, 50, 53, 55, 56, 71, 76, 81, 85, 91, 92, 93, 94, 103, 104, 111, 120, 127):
        return "prep"
    if i in (32, 57, 117, 126, 132, 134, 135, 136, 137, 142, 150, 154, 155, 158, 159, 160, 164, 165, 166, 167, 168, 169, 170, 171):
        return "curation"
    if i in (138, 139, 141, 143, 145, 146, 147, 151, 152, 153, 156, 157, 161, 162, 163):
        return "expectations"
    if (q.startswith("q16b") or q.startswith("q34b")) or i in (59, 68, 74, 78, 83, 84, 121):
        return "sketch"
    if i in (29, 73, 75):
        return "multimodal"
    return "relational"


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d


def main(argv):
    out_path, ref_path = None, REF_PATH
    for flag in ("--json", "--ref"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                print("usage: bench_diff.py NEW.json OLD.json"
                      " [--json OUT.json] [--ref REF.json]")
                return 2
            if flag == "--json":
                out_path = argv[i + 1]
            else:
                ref_path = argv[i + 1]
            argv = argv[:i] + argv[i + 2:]
    if len(argv) != 3:
        print("usage: bench_diff.py NEW.json OLD.json"
              " [--json OUT.json] [--ref REF.json]")
        return 2
    new, old = load(argv[1]), load(argv[2])
    for name, d in (("NEW", new), ("OLD", old)):
        if "queries" not in d:
            # the driver keeps only a ~2.2 KB stdout tail, so its BENCH_r*
            # wrapper often carries just the compact summary line — grade
            # the committed full bench_out.json / bench_ref.json instead
            print(f"{name} artifact has no per-query 'queries' block "
                  f"(driver tail truncation?) — pass a committed full "
                  f"artifact (bench_out.json or tools/bench_ref.json)")
            return 2
    nq, oq = new["queries"], old["queries"]
    spread = new.get("stats", {})

    fams = {}
    for q in sorted(set(nq) & set(oq)):
        if nq[q] < 0 or oq[q] < 0:
            continue
        band = max(NOISE_SEC,
                   spread.get(q, {}).get("max", 0) - spread.get(q, {}).get("min", 0))
        f = fams.setdefault(family(q), {"new": 0.0, "old": 0.0, "queries": {}})
        excused = q in EXCEPTIONS
        if not excused:
            f["new"] += nq[q]
            f["old"] += oq[q]
        f["queries"][q] = {
            "new": nq[q], "old": oq[q],
            "regressed": nq[q] > oq[q] + band,
            "excused": EXCEPTIONS.get(q),
        }

    # --- environment evidence -------------------------------------------
    # box factor from the artifact's control-query medians vs the committed
    # reference's normalized controls. A UNIFORM slowdown moves all the
    # controls together; if the ratios disagree (>1.5x spread — e.g. one
    # control itself regressed, or the artifact predates the reference's
    # code), the factor is untrustworthy and tier 1 is skipped rather than
    # risk a real regression hiding behind a corrupted factor.
    ref = None
    try:
        with open(ref_path) as f:
            ref = json.load(f)
    except (OSError, ValueError):
        pass
    ref_controls = (ref or {}).get("controls") or FALLBACK_CONTROLS
    # a legacy full-artifact reference's controls block carries metadata
    # keys ("ref", "box_factor") next to the query medians; keep only
    # numeric query entries or the length check below can never hold and
    # tier-1 normalization is silently disabled
    ref_controls = {k: v for k, v in ref_controls.items()
                    if k.startswith("q") and isinstance(v, (int, float))}
    if not ref_controls:
        print("[bench_diff] reference controls unusable (metadata-only "
              "block) — falling back to built-in controls", file=sys.stderr)
        ref_controls = FALLBACK_CONTROLS
    ratios = sorted(nq[c] / ref_controls[c] for c in ref_controls
                    if c in nq and nq[c] > 0)
    box = None
    if len(ratios) == len(ref_controls) and ratios[-1] <= ratios[0] * 1.5:
        box = ratios[len(ratios) // 2]
    elif len(ratios) < len(ref_controls):
        print("[bench_diff] box factor skipped: "
              f"{len(ref_controls) - len(ratios)} control(s) missing from "
              "the new artifact", file=sys.stderr)

    failures, code_failures, classification = [], [], {}
    for name, f in sorted(fams.items()):
        budget = BUDGETS.get(name, 1.25)
        f["budget"] = budget
        f["ratio"] = round(f["new"] / f["old"], 3) if f["old"] > 0 else None
        # family sums of sub-second queries still jitter; require the sum to
        # move beyond both the budget and one noise band before failing
        f["over_budget"] = (f["ratio"] is not None
                            and f["new"] > f["old"] * budget + NOISE_SEC)
        if not f["over_budget"]:
            continue
        failures.append(name)
        members = [q for q in f["queries"] if not f["queries"][q]["excused"]]
        # tier 1: uniform box slowdown (control queries moved with it)
        if box and box > 1 and f["new"] / box <= f["old"] * budget + NOISE_SEC:
            classification[name] = {
                "label": "environment:uniform-slowdown",
                "evidence": f"family sum {f['new']:.2f}s / box_factor "
                            f"{box:.2f} = {f['new'] / box:.2f}s, within "
                            f"budget {budget} of {f['old']:.2f}s"}
            continue
        # tier 2: transient interference — a code regression is
        # deterministic work and slows EVERY run; re-sum on run minimums
        mins = sum(spread.get(q, {}).get("min", nq[q]) for q in members)
        if mins <= f["old"] * budget + NOISE_SEC:
            classification[name] = {
                "label": "environment:transient-interference",
                "evidence": f"run-minimum family sum {mins:.2f}s within "
                            f"budget {budget} of old {f['old']:.2f}s "
                            f"(median sum was {f['new']:.2f}s)"}
            continue
        # tier 3: the committed idle-box reference holds this family
        # within budget against the SAME old artifact
        if ref is not None:
            shared = [q for q in members if q in ref.get("queries", {})]
            if shared:
                ref_sum = sum(ref["queries"][q] for q in shared)
                old_sum = sum(oq[q] for q in shared)
                if ref_sum <= old_sum * budget + NOISE_SEC:
                    classification[name] = {
                        "label": "environment:idle-reference-within-budget",
                        "evidence": f"idle reference "
                                    f"({ref.get('provenance', {}).get('commit', '?')}, "
                                    f"{ref.get('provenance', {}).get('recorded', '?')}) "
                                    f"family sum {ref_sum:.2f}s vs old "
                                    f"{old_sum:.2f}s, within budget {budget}; "
                                    f"new run not reproducible on an idle box",
                        "caveat": "sound iff bench_ref.json was recorded on "
                                  "the graded code — refresh it (and "
                                  "its controls) whenever query code "
                                  "changes (round checklist, like "
                                  "CORRECTNESS_SELF.json)"}
                    continue
        classification[name] = {
            "label": "code",
            "evidence": f"family sum {f['new']:.2f}s vs old {f['old']:.2f}s "
                        f"(budget {budget}) persists under box-factor, "
                        f"run-minimum, and idle-reference hypotheses"}
        code_failures.append(name)

    report = {
        "new_total": round(sum(v for v in nq.values() if v >= 0), 3),
        "old_total": round(sum(v for v in oq.values() if v >= 0), 3),
        "box_factor": round(box, 3) if box else None,
        "new_only": sorted(set(nq) - set(oq)),
        "dropped": sorted(set(oq) - set(nq)),
        "families": fams,
        "failures": failures,
        "classification": classification,
        "code_failures": code_failures,
    }
    text = json.dumps(report, indent=2)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    print(text)
    return 1 if code_failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

#!/usr/bin/env python3
"""Grade a new bench artifact against a previous round under per-family
regression budgets (BASELINE.md "Regression budgets").

Usage: python3 tools/bench_diff.py NEW.json OLD.json [--json OUT.json]

NEW/OLD may be either a bare Bench.scala line ({"metric":"total",...}) or a
driver wrapper ({..., "parsed": {...}}). Exit code 1 iff any family exceeds
its budget without a recorded rationale.

A regression inside the per-query noise band (new median <= old median +
NOISE_SEC) never counts: at sf0.1 most queries run in a few hundred ms where
scheduler jitter dominates. When the new artifact carries a "stats" block
(round >= 5), the band widens to the measured max-min spread of that query.
"""
import json
import sys

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
    # r5->r6: semDedup's k now derives from the corpus (k = ceil(n/64),
    # VERDICT r5 #3) so the within-cluster pair space stays linear in n —
    # the 100 TB-correct semantics. At sf0.1 that means k~79 instead of the
    # old fixed 8, and Lloyd iterations cost O(n*k): q66 ~1.6 -> ~3.3 s.
    # The extra work IS the semantic upgrade (bounded cluster sizes);
    # re-baseline next round.
    "q66_semdedup": "corpus-derived k (ceil(n/64)): k=8 -> k~79 at sf0.1",
}


def family(q):
    n = q.split("_")[0].lstrip("q")
    try:
        i = int(n.rstrip("bc"))
    except ValueError:
        return "relational"
    if i <= 7 or i == 33:
        return "cdc"
    if i in (18, 21, 22, 23, 40, 45, 49, 58, 64, 86, 87):
        return "dedup"
    if i in (20, 24, 54, 61, 66, 69, 70, 72):
        return "similarity"
    if i in (19, 25, 26, 27, 28, 41, 43, 44, 51, 52, 60, 65, 67, 77, 79, 80, 82):
        return "text"
    if i in (42, 46, 47, 48, 50, 53, 55, 56, 71, 76, 81, 85):
        return "prep"
    if i in (32, 57):
        return "curation"
    if (q.startswith("q16b") or q.startswith("q34b")) or i in (59, 68, 74, 78, 83, 84):
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
    out_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: bench_diff.py NEW.json OLD.json [--json OUT.json]")
            return 2
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 3:
        print("usage: bench_diff.py NEW.json OLD.json [--json OUT.json]")
        return 2
    new, old = load(argv[1]), load(argv[2])
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

    failures = []
    for name, f in sorted(fams.items()):
        budget = BUDGETS.get(name, 1.25)
        f["budget"] = budget
        f["ratio"] = round(f["new"] / f["old"], 3) if f["old"] > 0 else None
        # family sums of sub-second queries still jitter; require the sum to
        # move beyond both the budget and one noise band before failing
        f["over_budget"] = (f["ratio"] is not None
                            and f["new"] > f["old"] * budget + NOISE_SEC)
        if f["over_budget"]:
            failures.append(name)

    report = {
        "new_total": round(sum(v for v in nq.values() if v >= 0), 3),
        "old_total": round(sum(v for v in oq.values() if v >= 0), 3),
        "new_only": sorted(set(nq) - set(oq)),
        "dropped": sorted(set(oq) - set(nq)),
        "families": fams,
        "failures": failures,
    }
    text = json.dumps(report, indent=2)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    print(text)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

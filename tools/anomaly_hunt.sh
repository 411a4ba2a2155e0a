#!/bin/bash
# Fresh-JVM loop for graft.AnomalyProbe (NOTES.md round-13 sixth wave):
# the anomaly is sticky per JVM and appeared in a minority of fresh JVMs,
# so catching it needs repeated cold starts. Stops at the first caught
# JVM (exit 17, dumps under /tmp/anomaly_probe_<i>) or after N clean runs.
set -u
N="${1:-15}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$N"); do
  out="/tmp/anomaly_probe_$i"
  SPARK_GRAFT_PROBE_OUT="$out" \
    sbt -batch "runMain graft.AnomalyProbe" >"$out.log" 2>&1
  rc=$?
  if [ "$rc" -eq 17 ] || grep -q "\[anomaly\] CAUGHT" "$out.log"; then
    echo "CAUGHT on iteration $i — dumps in $out (log: $out.log)"
    exit 17
  fi
  grep "\[anomaly\]" "$out.log" || { echo "iteration $i: probe failed (rc=$rc, see $out.log)"; exit 1; }
  echo "iteration $i: clean"
done
echo "no anomaly in $N fresh JVMs"

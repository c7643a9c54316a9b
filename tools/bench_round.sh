#!/bin/bash
# Round bench orchestration: N full-registry samples at sf0.1 with the
# Bench tool's own contention probes, then the stream-read series and
# the OptAudit merge-cardinality probe in the SAME window. Run only on
# a quiet machine; check "contended" in each sample before compositing.
set -u
cd /root/repo
R="${1:-r20}"
N="${2:-5}"
for i in $(seq 1 "$N"); do
  echo "=== bench sample $i/$N ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -oE '\{"metric".*\}' > "BENCH_LOCAL_${R}_s$i.json"
  python3 - "BENCH_LOCAL_${R}_s$i.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"  total={d['value']:.1f}s queries={len(d['queries'])} "
      f"probe_spread={d.get('probe_spread')} io_spread={d.get('io_probe_spread')} "
      f"contended={d.get('contended')} errors={d.get('errors')}")
EOF
done
echo "=== stream read stats ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.StreamReadStats 20000000 32" 2>/dev/null \
  | grep -oE '\{"metric".*\}' > "STREAM_BENCH_${R}_raw.json"
cat "STREAM_BENCH_${R}_raw.json"
echo "=== opt audit (merge cardinality probe, same window) ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.OptAudit" 2>/dev/null \
  | grep -oE '\{"tool".*\}' > "OPTAUDIT_${R}.json"
cat "OPTAUDIT_${R}.json"

#!/bin/bash
# Round 4 orchestrator: ALL TPU work in one serialized background task
# (one tunnel client at a time).  Parks on the axon relay, then:
#   1. bench.py early capture (VERDICT item 2 — round 3 lost its perf
#      record to a relay outage; grab numbers the moment hardware exists)
#   2. queue8: the parked round-3 retrains (bottle, mug, camera, laptop,
#      table, bookshelf-resume, bathtub)
#   3. round_end.sh evals
# Progress markers on stdout; per-stage logs under /tmp/round4/.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
OUT=/tmp/round4
mkdir -p $OUT

until timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  sleep 60
done
echo "[round4] relay up at $(date +%H:%M:%S)"

echo "=== early bench capture ==="
python bench.py 2> $OUT/bench_early.err | tee $OUT/bench_early.json
echo "[round4] bench done at $(date +%H:%M:%S)"

echo "=== queue8 (parked round-3 retrains) ==="
bash scripts/train_queue8.sh 2>&1 | tee $OUT/queue8.log
echo "[round4] queue8 done at $(date +%H:%M:%S)"

echo "=== round_end evals ==="
bash scripts/round_end.sh 2>&1 | tee $OUT/round_end.log
echo "ROUND4_QUEUE_DONE"

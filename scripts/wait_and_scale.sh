#!/bin/bash
# Poll host capacity; when TWO consecutive probes read a clean epoch
# (>=90% of the 5.35e8 session peak), run the scaling bench at
# replicate=256. The bench itself aborts (rc 3 unstable / rc 4
# low-capacity, evidence untouched) if the epoch degrades mid-run;
# retry until the deadline.
cd /root/repo
DEADLINE=$(( $(date +%s) + ${1:-7200} ))
STABLE=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  CAP=$(python -c "
import sys; sys.path.insert(0,'.')
from bench import _host_capacity
print(int(_host_capacity()))" 2>/dev/null | tail -1)
  # launch gate at 88% of the 5.35e8 session peak: the bench's own
  # per-pair calibration is the real quality gate (it aborts with rc
  # 3/4 on mid-run degradation, leaving committed evidence untouched),
  # so the watcher can afford more launch attempts in a marginal epoch
  if [ "$CAP" -ge 470000000 ] 2>/dev/null; then STABLE=$((STABLE+1)); else STABLE=0; fi
  echo "$(date +%H:%M:%S) capacity=$CAP stable=$STABLE" >> /tmp/scale_watch.log
  if [ "$STABLE" -ge 2 ]; then
    echo "$(date +%H:%M:%S) launching scaling bench" >> /tmp/scale_watch.log
    # replicate=512 halves the relative weight of the fixed ~3s
    # submit+planning overhead vs 256 (the 32-core run grows to ~45s,
    # the overhead stays) — the amortization lever VERDICT r2 #4 names
    python scripts/scaling_bench.py /root/testdata/sf0.1 512 5 >> /tmp/scale_watch.log 2>&1
    RC=$?
    echo "$(date +%H:%M:%S) scaling bench rc=$RC" >> /tmp/scale_watch.log
    if [ "$RC" -eq 0 ]; then
      # same clean epoch: capture a calibrated flagship bench so the
      # official per-round bench number has an attributable sibling
      echo "$(date +%H:%M:%S) launching clean-epoch bench.py" >> /tmp/scale_watch.log
      python bench.py > BENCH/bench_clean_epoch.json 2>> /tmp/scale_watch.log \
        && echo "$(date +%H:%M:%S) bench.py captured" >> /tmp/scale_watch.log
      exit 0
    fi
    STABLE=0
  fi
  sleep 100
done
echo "deadline reached" >> /tmp/scale_watch.log

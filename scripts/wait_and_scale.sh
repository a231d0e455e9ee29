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
  if [ "$CAP" -ge 482000000 ] 2>/dev/null; then STABLE=$((STABLE+1)); else STABLE=0; fi
  echo "$(date +%H:%M:%S) capacity=$CAP stable=$STABLE" >> /tmp/scale_watch.log
  if [ "$STABLE" -ge 2 ]; then
    echo "$(date +%H:%M:%S) launching scaling bench" >> /tmp/scale_watch.log
    python scripts/scaling_bench.py /root/testdata/sf0.1 256 5 >> /tmp/scale_watch.log 2>&1
    RC=$?
    echo "$(date +%H:%M:%S) scaling bench rc=$RC" >> /tmp/scale_watch.log
    [ "$RC" -eq 0 ] && exit 0
    STABLE=0
  fi
  sleep 100
done
echo "deadline reached" >> /tmp/scale_watch.log

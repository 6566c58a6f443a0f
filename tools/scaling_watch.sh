#!/bin/bash
# Watch for a healthy host window (streaming-triad control >= 0.45 twice
# in a row — the same control bench.py's preflight gate uses, selected
# by host health only, never by engine numbers), then run the FULL
# recorded bench protocol and keep the artifacts.  Stops once a run's
# chain stayed in a clean window (clean_window.n_pairs >= 3 — again a
# control-only criterion); otherwise keeps watching for the next window.
cd /root/repo
for attempt in $(seq 1 200); do
  c1=$(python3 -c "import sys;sys.path.insert(0,'/root/repo');import bench;print(bench.membw_control()['efficiency'])" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe1 control=$c1"
  if python3 -c "exit(0 if float('$c1' or 0) >= 0.45 else 1)"; then
    c2=$(python3 -c "import sys;sys.path.insert(0,'/root/repo');import bench;print(bench.membw_control()['efficiency'])" 2>/dev/null)
    echo "$(date +%H:%M:%S) probe2 control=$c2"
    if python3 -c "exit(0 if float('$c2' or 0) >= 0.45 else 1)"; then
      echo "$(date +%H:%M:%S) healthy window — running full protocol (attempt $attempt)"
      env BENCH_DETAIL_OUT=/root/repo/BENCH_DETAIL_scaling_r05.json \
        python /root/repo/bench.py > /root/repo/.bench_watch_line.json 2>/root/repo/.bench_watch_err.txt
      tail -1 /root/repo/.bench_watch_line.json > /tmp/bw_line.json
      np=$(python3 -c "import json;d=json.load(open('/tmp/bw_line.json'));print(d['scaling'].get('clean_window',{}).get('n_pairs') or 0)" 2>/dev/null)
      med=$(python3 -c "import json;d=json.load(open('/tmp/bw_line.json'));print(d['scaling'].get('median_efficiency'))" 2>/dev/null)
      echo "$(date +%H:%M:%S) run done: clean_pairs=$np median_eff=$med"
      if python3 -c "exit(0 if int('$np' or 0) >= 3 else 1)"; then
        echo "CLEAN WINDOW CAPTURED — stopping"
        break
      fi
    fi
  fi
  sleep 60
done
echo WATCHER-EXIT

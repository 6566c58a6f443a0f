#!/bin/bash
# Watch for a healthy host window (streaming-triad control >= 0.45 twice
# in a row — the same control bench.py's preflight gate uses, selected
# by host health only, never by engine numbers), then run the FULL
# recorded bench protocol.  The candidate run writes to TEMP paths and
# is PROMOTED over the committed artifact only if its chain actually
# landed clean pairs (clean_window.n_pairs >= 1 — still a control-only
# criterion): a 2-minute control blip that closes before the chain must
# not clobber the previous recorded run (observed once: probes
# 0.498/0.613 at 23:56, bench's own preflight read 0.024 eight minutes
# later, and the junk run briefly overwrote the good disclosed-storm
# record before git restored it).  Stops once a promoted run held >= 3
# clean pairs.
cd /root/repo
for attempt in $(seq 1 500); do
  c1=$(python3 -c "import sys;sys.path.insert(0,'/root/repo');import bench;print(bench.membw_control()['efficiency'])" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe1 control=$c1"
  if python3 -c "exit(0 if float('$c1' or 0) >= 0.45 else 1)"; then
    c2=$(python3 -c "import sys;sys.path.insert(0,'/root/repo');import bench;print(bench.membw_control()['efficiency'])" 2>/dev/null)
    echo "$(date +%H:%M:%S) probe2 control=$c2"
    if python3 -c "exit(0 if float('$c2' or 0) >= 0.45 else 1)"; then
      echo "$(date +%H:%M:%S) healthy window — running full protocol (attempt $attempt)"
      env BENCH_DETAIL_OUT=/tmp/bench_detail_cand.json \
        python /root/repo/bench.py > /tmp/bench_line_cand.json 2>/root/repo/.bench_watch_err.txt
      tail -1 /tmp/bench_line_cand.json > /tmp/bw_line.json
      np=$(python3 -c "import json;d=json.load(open('/tmp/bw_line.json'));print(d['scaling'].get('clean_window',{}).get('n_pairs') or 0)" 2>/dev/null)
      med=$(python3 -c "import json;d=json.load(open('/tmp/bw_line.json'));print(d['scaling'].get('median_efficiency'))" 2>/dev/null)
      echo "$(date +%H:%M:%S) run done: clean_pairs=$np median_eff=$med"
      # r6 (ADVICE r5): promote only when the candidate's clean-pair
      # count is at least the incumbent artifact's — a later 1-pair run
      # must not clobber a previously promoted 2-pair record
      inc=$(python3 -c "import json;d=json.load(open('/root/repo/BENCH_DETAIL_scaling_r06.json'));print(d.get('scaling',{}).get('clean_window',{}).get('n_pairs') or 0)" 2>/dev/null || echo 0)
      if python3 -c "exit(0 if int('$np' or 0) >= max(1, int('$inc' or 0)) else 1)"; then
        cp /tmp/bench_detail_cand.json /root/repo/BENCH_DETAIL_scaling_r06.json
        cp /tmp/bench_line_cand.json /root/repo/.bench_watch_line.json
        echo "$(date +%H:%M:%S) PROMOTED (clean_pairs=$np, incumbent=$inc)"
        if python3 -c "exit(0 if int('$np' or 0) >= 3 else 1)"; then
          echo "CLEAN WINDOW CAPTURED — stopping"
          break
        fi
      else
        echo "$(date +%H:%M:%S) candidate NOT promoted (no clean pairs — blip or storm)"
      fi
    fi
  fi
  sleep 60
done
echo WATCHER-EXIT

#!/bin/bash
# Round-4 evidence runner: execute every probe whose parity_results.json
# entry was missing at the end of round 3 (VERDICT r3 "missing" 1b-1d, 7),
# sequentially so a failed compile doesn't lose earlier results.
cd /root/repo
mkdir -p /tmp/probelogs
run() {
  name=$1; shift
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a /tmp/probelogs/runner.log
  timeout 2400 python "$@" > "/tmp/probelogs/$name.log" 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] $name exit=$rc" | tee -a /tmp/probelogs/runner.log
  tail -5 "/tmp/probelogs/$name.log" | tee -a /tmp/probelogs/runner.log
}
run device_l27_echo    benchmarks/device_l27_probe.py 27 2
run hi_echo_28         benchmarks/l29plus_hi_echo_probe.py 28
run hi_echo_29         benchmarks/l29plus_hi_echo_probe.py 29
run hi_echo_30         benchmarks/l29plus_hi_echo_probe.py 30
run sharded_hi_24      benchmarks/sharded_hi_probe.py 24 20 2
run sharded_hi_27      benchmarks/sharded_hi_probe.py 27 20 2
run sharded_gen_hi_24  benchmarks/sharded_general_hi_probe.py 24 20 2 y
run hi_fwd_30_anchor   benchmarks/l29plus_hi_probe.py 30
echo "=== ALL DONE $(date +%H:%M:%S)" | tee -a /tmp/probelogs/runner.log

#!/bin/bash
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq4.log; timeout "$1" "${@:2}" >> /tmp/chipq4.log 2>&1; echo "=== rc=$?" >> /tmp/chipq4.log; }
# 1M geometry: even deeper b-walk (32768x32 measured 6.08)
run 2400 python bench.py --channels 16384 --blocks 64
# 2M block-channels, deep walk, pcm as operand (may hit the XLA copy)
run 2400 python bench.py --channels 65536 --blocks 32
# 2M fallback: synth-in-step (no pcm operand at all)
run 3600 python bench.py --synth-in-step --channels 65536 --blocks 32
# roofline retry: prev/cur as separate operands (no sliced copies)
run 4800 python tools/roofline.py
echo "QUEUE4 DONE" >> /tmp/chipq4.log

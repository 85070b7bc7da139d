#!/bin/bash
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq5.log; timeout "$1" "${@:2}" >> /tmp/chipq5.log 2>&1; echo "=== rc=$?" >> /tmp/chipq5.log; }
# confirm the new default geometry (16384 x 64 = 1M block-channels)
run 2400 python bench.py
# deeper-still probe
run 2400 python bench.py --channels 8192 --blocks 128
# real-packet stream at the new default geometry
run 2400 python bench.py --real-stream
echo "QUEUE5 DONE" >> /tmp/chipq5.log

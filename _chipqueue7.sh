#!/bin/bash
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq7.log; timeout "$1" "${@:2}" >> /tmp/chipq7.log 2>&1; echo "=== rc=$?" >> /tmp/chipq7.log; }
run 2400 python bench.py --iters 16
echo "QUEUE7 DONE" >> /tmp/chipq7.log

#!/bin/bash
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq6.log; timeout "$1" "${@:2}" >> /tmp/chipq6.log 2>&1; echo "=== rc=$?" >> /tmp/chipq6.log; }
run 2400 python tools/tpu_parity.py --fuse-frontend --decim-dtype bf16 --out PARITY_TPU_BF16.json
echo "QUEUE6 DONE" >> /tmp/chipq6.log

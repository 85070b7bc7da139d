#!/bin/bash
# Round-4 queue 3: capacity with state donation.
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq3.log; timeout "$1" "${@:2}" >> /tmp/chipq3.log 2>&1; echo "=== rc=$?" >> /tmp/chipq3.log; }
# 1M headline with donated state + the chosen peak_gate=7.0
run 2400 python bench.py
# re-pin default + int8 parity at the chosen gate
run 2400 python tools/tpu_parity.py --fuse-frontend
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --out PARITY_TPU_INT8.json
# 2M block-channel dispatch: synth-in-step + donated state
run 3600 python bench.py --synth-in-step --channels 262144
# 1M geometry A/B: deeper b-walk amortizes the per-channel-block
# state flush; narrower channel set halves the carried planes
run 2400 python bench.py --channels 65536 --blocks 16
run 2400 python bench.py --channels 32768 --blocks 32
# roofline retry: buffers freed between rows, RNG under jit
run 4800 python tools/roofline.py
echo "QUEUE3 DONE" >> /tmp/chipq3.log

#!/bin/bash
# Refit-window default gate: full-statistics BER at R=128/64, AWGN +
# the 35 Hz CFO edge.  Waits for queue2.  Logs to /tmp/chipq3.log.
cd /root/repo
while ! grep -q "QUEUE2 DONE" /tmp/chipq2.log 2>/dev/null; do sleep 20; done
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq3.log; timeout "$1" "${@:2}" >> /tmp/chipq3.log 2>&1; echo "=== rc=$?" >> /tmp/chipq3.log; }
B="python -m singlecarrier_tpu ber --path fused_rx --hunt-dtype int8 --decim-dtype bf16 --packets 10 --trials 64"
run 5400 bash -c "$B --refit-symbols 128 --snrs 2,4,6 | grep '^{' > /tmp/ber_r128_full.jsonl"
run 5400 bash -c "$B --refit-symbols 64  --snrs 2,4,6 | grep '^{' > /tmp/ber_r64_full.jsonl"
run 5400 bash -c "$B --cfo 35 --snrs 4 | grep '^{' > /tmp/ber_r0_cfo35.jsonl"
run 5400 bash -c "$B --refit-symbols 128 --cfo 35 --snrs 4 | grep '^{' > /tmp/ber_r128_cfo35.jsonl"
run 5400 bash -c "$B --refit-symbols 64  --cfo 35 --snrs 4 | grep '^{' > /tmp/ber_r64_cfo35.jsonl"
echo "QUEUE3 DONE" >> /tmp/chipq3.log

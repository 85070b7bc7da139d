#!/bin/bash
# Post-queue measurements (waits for the main queue): refit-window
# knob A/Bs, a quick BER delta at the knob, roofline regen at the
# espan operating point.  Logs to /tmp/chipq2.log.
cd /root/repo
while ! grep -q "QUEUE DONE" /tmp/chipq.log 2>/dev/null; do sleep 30; done
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq2.log; timeout "$1" "${@:2}" >> /tmp/chipq2.log 2>&1; echo "=== rc=$?" >> /tmp/chipq2.log; }
run 2400 python bench.py --refit-symbols 128
run 2400 python bench.py --refit-symbols 64
run 5400 bash -c 'python -m singlecarrier_tpu ber --path fused_rx --hunt-dtype int8 --decim-dtype bf16 --refit-symbols 128 --snrs 4,6 --packets 10 --trials 16 | grep "^{" > /tmp/ber_refit128.jsonl'
run 5400 python tools/roofline.py
run 3600 python tools/gated_wrapper_bench.py
# re-check: real-stream read 4% under the noise headline at espan
run 2400 python bench.py --real-stream
echo "QUEUE2 DONE" >> /tmp/chipq2.log

#!/bin/bash
# Follow-up chip queue: round-4 A/Bs added after the main queue started.
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq2.log; timeout "$1" "${@:2}" >> /tmp/chipq2.log 2>&1; echo "=== rc=$?" >> /tmp/chipq2.log; }

# bf16 CFO-DFT A/B at the 1M headline point (exact micro-opts included
# in both arms since they are now the committed kernel).
run 3600 python bench.py --cfo-dtype bf16
# synth-in-step: does removing the pcm jit operand (and its XLA
# memory-space copy into the custom call) pay at 1M?
run 3600 python bench.py --synth-in-step
# ... and does it unlock the 2M block-channel dispatch?
run 3600 python bench.py --synth-in-step --channels 262144
# parity gate for the bf16 CFO operating point (fused one-kernel path)
run 3600 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --cfo-dtype bf16 --out PARITY_TPU_CFO16.json
# BER through the one-kernel fused RX retry (tx now under jit), artifact
run 7200 bash -c 'python -m singlecarrier_tpu ber --path fused_rx --hunt-dtype int8 --decim-dtype bf16 --snrs 2,3,4,5,6 --packets 6 --trials 8 | grep "^{" > BER_PALLAS.jsonl'
# detection curves retry (traced-freq branch fixed: static freq)
run 4800 python tools/detection_curves.py
# streaming superstep K=8 datapoint (K=4 measured 5.19 vs batch 5.59)
run 2400 python bench.py --mode production-scan --superstep 8
# roofline retry at the memory-safe fe row count
run 3600 python tools/roofline.py
# one-kernel per-stage split at the bf16 CFO point (tail attribution)
run 2400 python tools/profile_stages.py --one-kernel --channels 16384 --blocks 8 --decim-dtype bf16 --hunt-dtype int8 --cfo-dtype bf16
echo "QUEUE2 DONE" >> /tmp/chipq2.log

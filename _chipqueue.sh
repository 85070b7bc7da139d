#!/bin/bash
# On-chip artifact regeneration recipe (run from the repo root; serial,
# one chip).  Logs to /tmp/chipq.log.  Each item is independently
# re-runnable; timeouts cover cold Mosaic compiles through the tunnel.
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq.log; timeout "$1" "${@:2}" >> /tmp/chipq.log 2>&1; echo "=== rc=$?" >> /tmp/chipq.log; }

# headline + real-packet stream (BENCH_REALSTREAM.json by hand)
run 2400 python bench.py
run 2400 python bench.py --real-stream
# on-chip parity: seven pinned configs (hunt_norm=espan default since r5;
# R128 = the bench refit-window operating point)
run 2400 python tools/tpu_parity.py --fuse-frontend
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --out PARITY_TPU_INT8.json
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --refit-symbols 128 --out PARITY_TPU_R128.json
run 2400 python tools/tpu_parity.py --fuse-frontend --decim-dtype bf16 --out PARITY_TPU_BF16.json
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --cfo-dtype bf16 --out PARITY_TPU_CFO16.json
run 2400 python tools/tpu_parity.py --frac-timing --scan-pallas --out PARITY_TPU_FRAC.json
run 2400 python tools/tpu_parity.py --alpha 0.5 --scan-pallas --out PARITY_TPU_WIDE.json
# detector characterization: SHIPPED fused path, espan-normalized
# argmax, 1M noise blocks, corr_segments sweep (DETECTION.md)
run 7200 python tools/detection_curves.py --segments 8,16
# BER through the fused kernel: data-section-power calibration,
# 64 trials x 10 packets = 317k bits/point (>=100 errors to 6 dB)
run 7200 bash -c 'python -m singlecarrier_tpu ber --path fused_rx --hunt-dtype int8 --decim-dtype bf16 --refit-symbols 128 --snrs 2,3,4,5,6 --packets 10 --trials 64 | grep "^{" > BER_PALLAS.jsonl'
# detection-gated two-phase decode cost model (GATED_DECODE.json)
run 7200 python tools/gated_decode_bench.py
# segment-sweep throughput cost + the raw-power A/B datapoint
run 2400 python bench.py --corr-segments 16
run 2400 python bench.py --hunt-norm none
# streaming-mode datapoints (scan / superstep / batch at one geometry)
run 2400 python bench.py --mode production-scan
run 2400 python bench.py --mode production-scan --superstep 8
run 2400 python bench.py --channels 16384 --blocks 8
echo "QUEUE DONE" >> /tmp/chipq.log

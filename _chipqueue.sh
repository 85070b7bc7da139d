#!/bin/bash
# On-chip artifact regeneration recipe (run from the repo root; serial,
# one chip).  Logs to /tmp/chipq.log.  Each item is independently
# re-runnable; timeouts cover cold Mosaic compiles through the tunnel.
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq.log; timeout "$1" "${@:2}" >> /tmp/chipq.log 2>&1; echo "=== rc=$?" >> /tmp/chipq.log; }

# headline + real-packet stream (BENCH_REALSTREAM.json by hand)
run 2400 python bench.py
run 2400 python bench.py --real-stream
# on-chip parity: six pinned configs
run 2400 python tools/tpu_parity.py --fuse-frontend
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --out PARITY_TPU_INT8.json
run 2400 python tools/tpu_parity.py --fuse-frontend --decim-dtype bf16 --out PARITY_TPU_BF16.json
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --cfo-dtype bf16 --out PARITY_TPU_CFO16.json
run 2400 python tools/tpu_parity.py --frac-timing --scan-pallas --out PARITY_TPU_FRAC.json
run 2400 python tools/tpu_parity.py --alpha 0.5 --scan-pallas --out PARITY_TPU_WIDE.json
# roofline, detector curves, BER through the fused kernel
run 4800 python tools/roofline.py
run 4800 python tools/detection_curves.py
# 64 trials x 10 packets = 317k bits/point: >=100 errors down to the
# 6 dB point (theory 8e-4) for real binomial CIs (VERDICT r4 #4)
run 7200 bash -c 'python -m singlecarrier_tpu ber --path fused_rx --hunt-dtype int8 --decim-dtype bf16 --snrs 2,3,4,5,6 --packets 10 --trials 64 | grep "^{" > BER_PALLAS.jsonl'
# streaming-mode datapoints (scan / superstep / batch at one geometry)
run 2400 python bench.py --mode production-scan
run 2400 python bench.py --mode production-scan --superstep 8
run 2400 python bench.py --channels 16384 --blocks 8
echo "QUEUE DONE" >> /tmp/chipq.log

#!/bin/bash
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq.log; timeout "$1" "${@:2}" >> /tmp/chipq.log 2>&1; echo "=== rc=$?" >> /tmp/chipq.log; }
run 2400 python bench.py --mode production-scan --superstep 4 --decim-dtype bf16 --hunt-dtype int8
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --out PARITY_TPU_INT8.json
run 2400 python tools/tpu_parity.py --fuse-frontend
run 2400 python tools/tpu_parity.py --frac-timing --scan-pallas --out PARITY_TPU_FRAC.json
run 2400 python tools/tpu_parity.py --alpha 0.5 --scan-pallas --out PARITY_TPU_WIDE.json
run 3000 python tools/roofline.py
run 3600 python tools/detection_curves.py
run 2400 python bench.py --real-stream --fuse-frontend 1 --channels 131072
echo "QUEUE DONE" >> /tmp/chipq.log

#!/bin/bash
# Round-4 chip work queue (sequential; one job owns the chip at a time)
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) $*" >> /tmp/chipq.log; timeout "$1" "${@:2}" >> /tmp/chipq.log 2>&1; echo "=== rc=$?" >> /tmp/chipq.log; }
run 1800 python bench.py --ls-bvec matmul
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --out PARITY_TPU_INT8.json
run 2400 python tools/tpu_parity.py --fuse-frontend
run 2400 python tools/tpu_parity.py --frac-timing --scan-pallas --out PARITY_TPU_FRAC.json
run 2400 python tools/tpu_parity.py --alpha 0.5 --scan-pallas --out PARITY_TPU_WIDE.json
run 3000 python tools/roofline.py
run 3000 python tools/detection_curves.py
echo "QUEUE DONE" >> /tmp/chipq.log

#!/bin/bash
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq2.log; timeout "$1" "${@:2}" >> /tmp/chipq2.log 2>&1; echo "=== rc=$?" >> /tmp/chipq2.log; }
# headline confirm with qring + iters=8 at the 1M default
run 2400 python bench.py
# geometry A/B at the same 1M block-channels
run 2400 python bench.py --channels 65536 --blocks 16
run 2400 python bench.py --channels 32768 --blocks 32
# streaming-mode triple at the 131k geometry, all at headline dtypes
run 2400 python bench.py --mode production-scan
run 2400 python bench.py --mode production-scan --superstep 4
run 2400 python bench.py --channels 16384
# per-stage split of the one-kernel RX
run 2400 python tools/profile_stages.py --one-kernel --channels 16384 --blocks 8 --decim-dtype bf16 --hunt-dtype int8
# BER through the Pallas batch path at the bench operating point
run 3600 python -m singlecarrier_tpu ber --path batch_pallas --hunt-dtype int8 --decim-dtype bf16 --snrs 2,3,4,5,6 --packets 6 --trials 8
echo "QUEUE2 DONE" >> /tmp/chipq2.log

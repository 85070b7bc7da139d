#!/bin/bash
# Consolidated round-4 on-chip work queue. Runs serially (one chip).
# Log: /tmp/chipq.log   Marker lines "=== <time> <cmd>" / "=== rc=<N>".
cd /root/repo
run() { echo "=== $(date +%H:%M:%S) ${@:2}" >> /tmp/chipq.log; timeout "$1" "${@:2}" >> /tmp/chipq.log 2>&1; echo "=== rc=$?" >> /tmp/chipq.log; }

# 1. Headline confirm: one-kernel fused RX, 1M block-channels, int8 qring.
run 2400 python bench.py
# 2. Parity gates for the headline operating point (int8 qring is new).
run 2400 python tools/tpu_parity.py --fuse-frontend --hunt-dtype int8 --decim-dtype bf16 --out PARITY_TPU_INT8.json
run 2400 python tools/tpu_parity.py --fuse-frontend
# 3. VERDICT #7: frac/wide configs on the streaming scan path.
run 2400 python tools/tpu_parity.py --frac-timing --scan-pallas --out PARITY_TPU_FRAC.json
run 2400 python tools/tpu_parity.py --alpha 0.5 --scan-pallas --out PARITY_TPU_WIDE.json
# 4. VERDICT #2: floor-honest roofline at the real operating point.
run 3600 python tools/roofline.py
# 5. VERDICT #3: streaming gap — scan vs superstep at 131k geometry.
run 2400 python bench.py --mode production-scan
run 2400 python bench.py --mode production-scan --superstep 4
run 2400 python bench.py --channels 16384
# 6. VERDICT #6: detector Pfa/Pd curves.
run 3600 python tools/detection_curves.py
# 7. VERDICT #8: BER through the Pallas batch path at the bench point.
run 5400 python -m singlecarrier_tpu ber --path fused_rx --hunt-dtype int8 --decim-dtype bf16 --snrs 2,3,4,5,6 --packets 6 --trials 8
# 8. Real-stream confirm on the fused path.
run 2400 python bench.py --real-stream --fuse-frontend 1 --channels 131072
# 9. Per-stage split of the one-kernel RX (for the tail-stage attack).
run 2400 python tools/profile_stages.py --one-kernel --channels 16384 --blocks 8 --decim-dtype bf16 --hunt-dtype int8
echo "QUEUE DONE" >> /tmp/chipq.log

#!/bin/bash
# Regenerate the committed acceptance evidence (VERDICT round-1 item 6):
# run C1-C5 on the real chip, writing results/tpu_accept.jsonl.
set -e
cd "$(dirname "$0")/.."
OUT=results/tpu_accept.jsonl
mkdir -p results
rm -f "$OUT"
for cfg in c1 c2 c3 c3rm c4; do
  echo "=== $cfg ===" >&2
  timeout 2400 python -m turbotpu.cli ber --config "$cfg" --results "$OUT" --no-resume
done
echo "=== c5 ===" >&2
# C5 acceptance flags mirror configs/acceptance.py C5 (NII chunk
# kernel, W=256, bf16 I/O, CRC early termination).
timeout 1800 python -m turbotpu.cli c5 --nii --window 256 >> "$OUT"
echo "=== c6 (transport block) ===" >&2
timeout 2400 python -m turbotpu.cli tb --config c6 --results "$OUT" --no-resume
echo "acceptance done" >&2

# Evidence artifacts (each script writes its experiments/*.json):
# flagship variance/batch/MAP-variant tuning (rep-scaled, round 5),
# window sweep + FER, quantized-extrinsic BER (int8 + fp8), MAP-variant
# BER (LTE + the UMTS/C3 paired run), K sweep + mixed-K cost, measured
# latency, seq glue, roofline, in-kernel-gather feasibility, comm model.
for exp in flagship_tuning nii_window_sweep ext_dtype_ber map_variant_ber \
           map_variant_umts k_sweep latency \
           seq_glue gather_inkernel; do
  echo "=== experiments/$exp ===" >&2
  timeout 2400 python "experiments/$exp.py"
done
echo "=== experiments/cost_breakdown roofline ===" >&2
timeout 1200 python experiments/cost_breakdown.py roofline
echo "=== experiments/comm_model (CPU fake mesh) ===" >&2
JAX_PLATFORMS=cpu timeout 1200 python experiments/comm_model.py
echo "evidence done" >&2

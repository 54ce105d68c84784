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
timeout 1200 python -m turbotpu.cli c5 >> "$OUT"
echo "=== c6 (transport block) ===" >&2
timeout 2400 python -m turbotpu.cli tb --config c6 --results "$OUT" --no-resume
echo "acceptance done" >&2

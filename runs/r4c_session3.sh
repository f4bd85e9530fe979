#!/bin/bash
# Round-4c TPU session, part 3: set-family serving rows (needs the
# part-2 set_study checkpoint) + third independent sessions for the
# headline families.  Serial.
set -x
cd /root/repo

# set-prediction family through the fused frame programs (trained wts)
for pass in 1 2; do
  for fam in set set_frontier; do
    for d in 1 2; do
      timeout 1200 python bench_closed_loop.py --family $fam --depth $d \
        --iters 30 --out runs/closed_loop_r4.jsonl
    done
  done
done

# third independent session for the headline families (3-session table)
for fam in guided frontier distill_frontier; do
  for d in 1 2; do
    timeout 1200 python bench_closed_loop.py --family $fam --depth $d \
      --iters 30 --out runs/closed_loop_r4.jsonl
  done
done

echo "R4C_SESSION_PART3_DONE"

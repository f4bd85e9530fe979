#!/bin/bash
# Round-4e: re-capture the whole-scene (--multi) rows on the FIXED
# multi-object program (tabletop-prior RANSAC + half-size candidate
# buffer, commit 0ae0427).  The closed_loop_r4.jsonl multi rows measured
# the broken program (K=4 objects_found=0) and the pre-fix K=2 buffer
# size; fresh provenance goes to closed_loop_r4b.jsonl.
set -x
cd /root/repo
for pass in 1 2; do
  for k in 2 4; do
    for fam in gan guided; do
      timeout 2400 python bench_closed_loop.py --family $fam --multi $k \
        --iters 30 --out runs/closed_loop_r4b.jsonl
    done
  done
done
echo "R4E_MULTI_DONE"

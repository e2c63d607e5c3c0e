#!/bin/sh
# Re-measure the serving-lever quality tables against STEERING weights
# (VERDICT r3 item 3): run after scripts/steer_train.py has produced
# steer_trainable.msgpack. Each line is one A/B vs the exact program with
# the same weights; JSON rows append to the given log.
# Usage: sh scripts/steered_quality_suite.sh [out.log]
set -x
OUT=${1:-steered_quality.log}
W=steer_trainable.msgpack
P="python scripts/quality_cached.py --trained $W"
# ControlNet-residual cache k=2 vs k=3 (r3: unresolvable at the noise floor)
$P --intervals 2 3                          >> "$OUT" 2>&1
# uniform k=3 (refreshes 0,3,..,18 = 7) vs front-loaded 7-refresh schedule
$P --cn_steps 0 1 2 4 7 11 16               >> "$OUT" 2>&1
# CFG window end sweep (r3 recommended end 0.4)
$P --intervals 1 --cfg_interval 0 0.3       >> "$OUT" 2>&1
$P --intervals 1 --cfg_interval 0 0.4       >> "$OUT" 2>&1
$P --intervals 1 --cfg_interval 0 0.5       >> "$OUT" 2>&1
# ToMe 0.5
$P --intervals 1 --tome 0.5                 >> "$OUT" 2>&1
# the recommended aggressive mode (cfg 0.4 + cn3) and the turbo stack
$P --intervals 3 --cfg_interval 0 0.4       >> "$OUT" 2>&1
$P --intervals 3 --unet_intervals 2 --cfg_interval 0 0.4 --tome 0.5 >> "$OUT" 2>&1

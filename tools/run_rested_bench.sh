#!/bin/bash
# Round-4 official rested-host measurement sequence (VERDICT.md r3 item #1).
#
# Methodology (BASELINE.md "Frontier scaling" section): this host enters a
# ~2-6x-slower state under sustained load and recovers over ~10 min of
# idleness, so every timed artifact below is preceded by an idle window:
# the full bench cools down inside bench.py (SPARK_BENCH_COOLDOWN_S,
# default 600 s), and each scaling leg cools down inside run_scaling
# (SPARK_SCALING_COOLDOWN_S). The timed numbers therefore measure the
# ENGINE, not the host's thermal history. Nothing else may run on the box
# while this script does.
set -u
cd /root/repo
STAMP() { date -u +%H:%M:%S; }

echo "$(STAMP) full bench (600s in-bench cooldown)" >> .rested_bench.log
python bench.py > .bench_rested_r4.out 2> .bench_rested_r4.err
rc=$?  # capture before $(STAMP) clobbers $?
echo "$(STAMP) bench rc=$rc" >> .rested_bench.log

echo "$(STAMP) scaling 2->8 (cooldown 540 per leg)" >> .rested_bench.log
SPARK_SCALING_COOLDOWN_S=540 python bench.py --scaling \
  > .scaling_r4_2_8.out 2> .scaling_r4_2_8.err
rc=$?
echo "$(STAMP) scaling28 rc=$rc" >> .rested_bench.log

echo "$(STAMP) scaling 1->4 (cooldown 540 per leg)" >> .rested_bench.log
SPARK_SCALING_COOLDOWN_S=540 SPARK_SCALING_LEVELS=1,4 python bench.py --scaling \
  > .scaling_r4_1_4.out 2> .scaling_r4_1_4.err
rc=$?
echo "$(STAMP) scaling14 rc=$rc" >> .rested_bench.log

echo "$(STAMP) ALL DONE" >> .rested_bench.log

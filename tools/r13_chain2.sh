#!/bin/bash
cd /root/repo
log=/tmp/r13chain2.log
echo "CHAIN2_START $(date)" > $log
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/r13bv_sf0001" > /tmp/r13b_v1.log 2>&1
echo "V_SF0001=$? $(date)" >> $log
python3 tools/check.py /root/testdata/sf0.001 /tmp/r13bv_sf0001 CORRECTNESS_local_r13_sf0.001.json > /tmp/r13b_c1.log 2>&1
echo "CHECK_SF0001=$? $(date)" >> $log
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/r13bv_sf001" > /tmp/r13b_v2.log 2>&1
echo "V_SF001=$? $(date)" >> $log
python3 tools/check.py /root/testdata/sf0.01 /tmp/r13bv_sf001 CORRECTNESS_local_r13.json > /tmp/r13b_c2.log 2>&1
echo "CHECK_SF001=$? $(date)" >> $log
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/r13bv_sf01" > /tmp/r13b_v3.log 2>&1
echo "V_SF01=$? $(date)" >> $log
python3 tools/check.py /root/testdata/sf0.1 /tmp/r13bv_sf01 CORRECTNESS_local_r13_sf0.1.json > /tmp/r13b_c3.log 2>&1
echo "CHECK_SF01=$? $(date)" >> $log
SPARK_DRIVER_MEM=32g sbt -batch "runMain graft.BenchLocal /root/testdata/sf0.1 BENCH_local_r13.json" > /tmp/r13b_bench.log 2>&1
echo "BENCHLOCAL=$? $(date)" >> $log
SPARK_DRIVER_MEM=32g sbt -batch "runMain graft.ScaleBench" > /tmp/r13b_sweep.log 2>&1
echo "SWEEP=$? $(date)" >> $log
echo "CHAIN2_DONE $(date)" >> $log

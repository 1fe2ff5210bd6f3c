#!/bin/bash
# Sequential TPU measurement battery (single-client tunnel: strictly serial).
cd /root/repo
set -x
date
timeout 3600 python scripts/probe_merkle.py          2>&1 | grep -vE "WARNING|INFO" | tail -5
date
timeout 5400 python scripts/run_all_statements.py    2>&1 | grep -vE "WARNING|INFO" | tail -16
date
timeout 3600 python scripts/bench_batch.py           2>&1 | grep -vE "WARNING|INFO" | tail -12
date
timeout 3600 python scripts/bench_scaling.py tpu     2>&1 | grep -vE "WARNING|INFO" | tail -12
date
timeout 3600 python scripts/bench_kernels.py         2>&1 | grep -vE "WARNING|INFO" | tail -24
date
timeout 3600 python bench.py                         2>&1 | tail -10
date

#!/bin/bash
# Serial TPU requalification after a relay outage: CLI drives + dtype A/B +
# full bench, one process at a time, logs under /tmp/requal_*.log.
set -u
cd /root/repo
echo "=== 1/4 relay probe ==="
timeout 300 python -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
x = jnp.ones((256,256)); print('relay ok:', float((x@x).sum()))
" || { echo "relay still down"; exit 1; }
echo "=== 2/4 monster CLI drive (SAM2 + RAFT precision changes) ==="
timeout 1500 python main_monster_slam.py --dataset /tmp/verify_rgb --max-frames 5 \
  --save-as requal_monster --raft-checkpoint random --sam2-checkpoint random \
  --no-viz > /tmp/requal_monster.log 2>&1
tail -3 /tmp/requal_monster.log
echo "=== 3/4 RAFT timing after HIGHEST-precision corr einsums ==="
timeout 900 python scripts/profile_raft_dtype.py > /tmp/requal_raft.log 2>&1
grep -v WARNING /tmp/requal_raft.log
echo "=== 4/4 full bench ==="
BENCH_BUDGET_S=700 timeout 800 python bench.py > /tmp/requal_bench.log 2>&1
grep -v WARNING /tmp/requal_bench.log | tail -4

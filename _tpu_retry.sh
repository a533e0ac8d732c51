#!/bin/bash
for i in $(seq 1 30); do
  echo "=== attempt $i $(date +%H:%M:%S)" 
  timeout 180 python -c "import jax, jax.numpy as jnp; print('PING OK', jax.devices(), float(jnp.ones(8).sum()))" 2>&1 | grep -v WARNING
  if [ ${PIPESTATUS[0]} -eq 0 ]; then
    echo "=== tunnel alive; running fix verification"
    timeout 900 python /root/repo/_dbg_pallas8.py 2>&1 | grep -v WARNING
    exit $?
  fi
  sleep 60
done
echo "tunnel never recovered"
exit 1

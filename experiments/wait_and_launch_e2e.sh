#!/bin/sh
# Wait for the axon relay to recover (CLAUDE.md: wedges are cleared by
# a watchdog in ~10-40 min), then launch the flagship synthetic e2e.
# Run detached (setsid) so it survives the builder session.
cd /root/repo
while true; do
  if timeout 60 python -c "import numpy as np, jax.numpy as jnp; np.asarray(jnp.arange(4))" >/dev/null 2>&1; then
    echo "[$(date -u +%H:%M:%S)] relay live — launching e2e" >> /tmp/e2e_launcher.log
    break
  fi
  echo "[$(date -u +%H:%M:%S)] relay still wedged; retrying" >> /tmp/e2e_launcher.log
  sleep 60
done
python experiments/flagship_synthetic_e2e.py --skip-gen \
  > /tmp/flagship_e2e3.log 2>&1
echo "EXIT $?" >> /tmp/flagship_e2e3.log

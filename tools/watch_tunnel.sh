#!/bin/bash
# Tunnel watcher: probe jax.devices() + a tiny reduction until the axon
# TPU tunnel answers, then chain the queued experiment commands from
# tools/r4_queue.txt (one shell command per line, run sequentially).
# Run: nohup bash tools/watch_tunnel.sh > /tmp/tunnel_watch.log 2>&1 &
set -u
QUEUE="${1:-/root/repo/tools/r4_queue.txt}"
cd /root/repo
while true; do
  if timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
import jax.numpy as jnp
ds = jax.devices()
assert ds, ds
assert float(jnp.arange(8.0).sum()) == 28.0
EOF
  then
    echo "$(date -Is) tunnel UP"
    break
  fi
  echo "$(date -Is) tunnel down, sleeping"
  sleep 120
done
n=0
while IFS= read -r line || [ -n "$line" ]; do
  case "$line" in ''|'#'*) continue ;; esac
  n=$((n+1))
  echo "$(date -Is) RUN[$n] $line"
  timeout 7200 bash -c "$line"
  echo "$(date -Is) DONE[$n] rc=$?"
done < "$QUEUE"
echo "$(date -Is) queue drained"

#!/bin/bash
# Wait for a calm CPU window (steal < $1 ticks per 10s, default 80),
# then exec the rest of the args. Prints the observed steal rate.
THRESH=${1:-80}; shift
for i in $(seq 1 90); do
  S1=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 10
  S2=$(awk '/^cpu /{print $9}' /proc/stat)
  D=$((S2-S1))
  echo "calm_run: steal ${D} ticks/10s (threshold ${THRESH})" >&2
  if [ "$D" -lt "$THRESH" ]; then
    echo "calm_run: window open, running" >&2
    exec "$@"
  fi
done
echo "calm_run: no calm window after 15 min, running anyway" >&2
exec "$@"

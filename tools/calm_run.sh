#!/bin/bash
# Wait for a calm CPU window (steal below a tick threshold per 10s),
# then exec the given command. The first arg is the threshold ONLY if
# it is numeric; otherwise the default (80) applies and all args are
# the command. Prints the observed steal rate to stderr.
THRESH=80
case "$1" in
  ''|*[!0-9]*) : ;;            # non-numeric: part of the command
  *) THRESH=$1; shift ;;
esac
if [ $# -eq 0 ]; then
  echo "calm_run: no command given" >&2
  exit 2
fi
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

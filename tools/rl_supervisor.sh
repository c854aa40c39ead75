#!/bin/bash
# Keep a long RL-loop run alive across hung device calls / crashes.
#
#   tools/rl_supervisor.sh OUT_DIR [cli args...]
#
# Starts `python -m dream_go_tpu.cli` in its own process group, appends to
# OUT_DIR/run.log, and restarts it if the log goes silent for more than
# $STALL_MINUTES (default 45 — longer than any single generation phase, so
# only a genuinely wedged remote call trips it). Pass --resume-loop in the
# cli args so each restart continues from the last checkpoint. Kills use the
# exact process group, never name patterns.
set -u
OUT=$1; shift
mkdir -p "$OUT"
LOG="$OUT/run.log"
STALL=${STALL_MINUTES:-45}

while true; do
    setsid python -m dream_go_tpu.cli "$@" >> "$LOG" 2>&1 &
    PID=$!
    PGID=$(ps -o pgid= -p "$PID" | tr -d ' ')
    echo "supervisor: started pid $PID pgid $PGID" >> "$LOG"
    while kill -0 "$PID" 2>/dev/null; do
        sleep 60
        now=$(date +%s)
        last=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
        if [ $((now - last)) -gt $((STALL * 60)) ]; then
            echo "supervisor: log silent ${STALL}m, restarting" >> "$LOG"
            kill -- "-$PGID" 2>/dev/null
            sleep 10
            kill -9 -- "-$PGID" 2>/dev/null
            break
        fi
    done
    wait "$PID"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "supervisor: clean exit" >> "$LOG"
        break
    fi
    echo "supervisor: exit code $rc, restarting in 15s" >> "$LOG"
    sleep 15
done

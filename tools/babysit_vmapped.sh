#!/bin/sh
# Stall-tolerant driver for tools/imitation15_vmapped.py on the hosted-TPU
# tunnel.  A dropped tunnel connection can orphan an in-flight device call,
# leaving the client blocked forever on a futex while the (serialized)
# tunnel stays wedged for every other process — observed 2026-08-20 ~09:27
# (round 5): killing the exact hung PID unwedged the chip instantly.
#
# This wrapper watches the run's progress.jsonl mtime; if no row lands for
# STALL_S seconds it kills ITS OWN child (exact PID — never pattern kills)
# and relaunches with --resume from the periodic checkpoint.
#
#   tools/babysit_vmapped.sh <budget_s> <log_root> <ckpt_root> <logfile> \
#       <trainer args...>
set -u
BUDGET=$1; LOG_ROOT=$2; CKPT_ROOT=$3; LOGFILE=$4; shift 4
DEADLINE=$(( $(date +%s) + BUDGET ))
STALL_S=${STALL_S:-600}
cd /root/repo || exit 1
mkdir -p chainlog "$LOG_ROOT" "$CKPT_ROOT"

attempt=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    attempt=$((attempt + 1))
    RESUME=""
    if [ -f "$CKPT_ROOT/imit15_state.npz" ] && [ "$attempt" -gt 1 ]; then
        # our own checkpoint has exactly this run's lanes: override any
        # --resume/--resume-clips in "$@" (argparse last-wins) and make the
        # lane surgery an identity map via RESUME_CLIPS (caller sets it to
        # this run's --clips when the original args use --resume-lanes)
        RESUME="--resume $CKPT_ROOT/imit15_state.npz"
        [ -n "${RESUME_CLIPS:-}" ] && \
            RESUME="$RESUME --resume-clips $RESUME_CLIPS"
    fi
    left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -le 120 ] && break
    echo "== attempt $attempt left=${left}s $(date -u +%H:%M:%S)" \
        >> "chainlog/$LOGFILE.watch"
    # shellcheck disable=SC2086
    timeout -k 60 "$left" python -u tools/imitation15_vmapped.py "$@" \
        $RESUME --log-root "$LOG_ROOT" --ckpt-root "$CKPT_ROOT" \
        >> "chainlog/$LOGFILE" 2>&1 &
    PID=$!
    CHILD_START=$(date +%s)
    # watch: child exit OR progress stall
    while kill -0 "$PID" 2>/dev/null; do
        sleep 30
        now=$(date +%s)
        last=0
        [ -f "$LOG_ROOT/progress.jsonl" ] && \
            last=$(stat -c %Y "$LOG_ROOT/progress.jsonl")
        if [ "$last" -ge "$CHILD_START" ]; then
            age=$(( now - last ))            # training: rows are flowing
            limit=$STALL_S
        else
            age=$(( now - CHILD_START ))     # still compiling
            limit=$(( STALL_S * 3 ))
        fi
        if [ "$age" -gt "$limit" ]; then
            echo "== STALL (${age}s) killing $PID $(date -u +%H:%M:%S)" \
                >> "chainlog/$LOGFILE.watch"
            kill "$PID" 2>/dev/null; sleep 10
            kill -9 "$PID" 2>/dev/null
            break
        fi
        [ "$now" -ge "$DEADLINE" ] && { kill "$PID" 2>/dev/null; break; }
    done
    wait "$PID" 2>/dev/null
    rc=$?
    echo "== attempt $attempt rc=$rc $(date -u +%H:%M:%S)" \
        >> "chainlog/$LOGFILE.watch"
    [ "$rc" -eq 0 ] && break
    sleep 5
done
echo "== babysit done $(date -u +%H:%M:%S)" >> "chainlog/$LOGFILE.watch"

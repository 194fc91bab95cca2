#!/usr/bin/env bash
# Executor-loss durability drill (graft.CkptDrill): run semDedup under
# a REAL multi-process master, SIGKILL one executor JVM mid-run, and
# assert the reliable-checkpoint run completes with an identical drop
# set. Usage:
#   tools/ckpt_drill.sh [fixture-dir] [kill-after-ms] [mode]
# mode: durable (default — asserted) | local (negative leg — recorded)
set -euo pipefail
cd "$(dirname "$0")/.."
DIR="${1:-/tmp/graft_scale/x10}"
KILL_MS="${2:-5000}"
MODE="${3:-durable}"
CKPT=$(mktemp -d /tmp/graft_drill_ckpt.XXXXXX)
LOG=$(mktemp /tmp/graft_drill_log.XXXXXX)
trap 'rm -rf "$CKPT"' EXIT
sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | head -1)
SPARK_GRAFT_DRILL_DIR="$DIR" SPARK_GRAFT_DRILL_KILL_MS="$KILL_MS" \
SPARK_GRAFT_DRILL_MODE="$MODE" SPARK_HOME=/opt/spark \
/opt/spark/bin/spark-submit \
  --master 'local-cluster[2,4,3072]' \
  --driver-memory 4g \
  --conf "spark.graft.checkpointDir=$CKPT" \
  --conf spark.ui.enabled=false \
  --class graft.CkptDrill "$JAR" 2>"$LOG" || {
    # surface the drill's own diagnostics (the [drill] FAIL reason) —
    # a silent exit-1 undercuts the CI-able intent (r17 advisor); the
    # full stderr stays in $LOG for forensics
    rc=$?
    grep '^\[drill\]' "$LOG" >&2 || true
    echo "[drill] full stderr: $LOG" >&2
    exit $rc
  }
grep '^\[drill\]' "$LOG" >&2 || true

#!/bin/bash
# Detached completion hook for the full 50-epoch run: when full_run.py has
# written both artifacts (docs/full_run_eval.json lands last), render
# docs/FULL_RUN.md, extract the weights-only end-state artifact, bundle the
# TensorBoard events, and commit — so the deliverable lands even if no
# interactive session is alive at completion time.
set -u
cd /root/repo
LOG=/tmp/full_run/watcher.log
exec >>"$LOG" 2>&1

while true; do
  if [ -f docs/full_run_eval.json ] && [ -f docs/full_run.json ]; then
    echo "[watcher] artifacts present at $(date -u)"
    sleep 60  # let the orchestrator finish its final writes
    python scripts/report_full_run.py || echo "[watcher] report FAILED"
    python scripts/extract_final_params.py || echo "[watcher] extract FAILED"
    mkdir -p docs/artifacts
    tar czf docs/artifacts/full_run_tensorboard.tgz -C /tmp/full_run tensorboard \
      || echo "[watcher] tb bundle FAILED"
    # Scope the commit to exactly the run artifacts: `--` pathspecs commit only
    # these paths regardless of what else happens to be staged in the index
    # (an interactive session may have its own work staged concurrently).
    git add docs/full_run.json docs/full_run_eval.json docs/FULL_RUN.md docs/artifacts
    git commit -m "Full 50-epoch recipe completed: run report, held-out eval, end-state artifacts" \
      -- docs/full_run.json docs/full_run_eval.json docs/FULL_RUN.md docs/artifacts \
      || echo "[watcher] commit FAILED (or nothing to commit)"
    echo "[watcher] done at $(date -u)"
    break
  fi
  sleep 60
done

#!/bin/bash
# Run a command from an immutable snapshot of HEAD, so in-flight TPU
# runs never mix module versions with concurrent source edits.
#   scripts/launch_snapshot.sh <name> <command...>
# The command runs with CWD=/tmp/alfi_snap_<name>; write logs to
# absolute paths under /root/repo/results/logs.  checkpoint/ inside the
# snapshot is a symlink to a PERSISTENT per-name dir, so a retried
# stage (tunnel death mid-sweep) resumes its Reynolds continuation
# instead of starting the multi-hour sweep over.
set -e
NAME="$1"; shift
SNAP="/tmp/alfi_snap_$NAME"
CKPT="/root/repo/results/checkpoint_$NAME"
rm -rf "$SNAP"
mkdir -p "$SNAP" "$CKPT"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
ln -sfn "$CKPT" "$SNAP/checkpoint"
cd "$SNAP"
exec "$@"

#!/bin/bash
# Run a command from an immutable snapshot of HEAD, so in-flight TPU
# runs never mix module versions with concurrent source edits.
#   scripts/launch_snapshot.sh <name> <command...>
# The command runs with CWD=/tmp/alfi_snap_<name> (checkpoints etc. stay
# there); write logs to absolute paths under /root/repo/results/logs.
set -e
NAME="$1"; shift
SNAP="/tmp/alfi_snap_$NAME"
rm -rf "$SNAP"
mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
exec "$@"

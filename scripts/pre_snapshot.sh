#!/usr/bin/env bash
# Pre-snapshot gate: run before the round's final commit.
#
# Round 6's only red test was a query added in the end-of-round snapshot
# commit five minutes AFTER the ContractSpec that forbids oracle-less
# queries landed — i.e. the final commit was never checked. ContractSpec
# is pure map introspection (no Spark session, <1 s after compile), so
# there is no excuse to skip it.
#
# Usage: scripts/pre_snapshot.sh   (exits non-zero on any failure)
set -euo pipefail
cd "$(dirname "$0")/.."
exec sbt -batch "testOnly graft.ContractSpec"

#!/usr/bin/env bash
# Job payload wrapper (parity with reference bin/run.sh): source env then
# exec the given command; usable as the {cmd} target of any scheduler.
set -euo pipefail
source "$(dirname "${BASH_SOURCE[0]}")/setup.sh"
exec "$@"

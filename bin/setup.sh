#!/usr/bin/env bash
# Environment glue (parity with reference bin/setup.sh): export repo root
# on PYTHONPATH without clobbering preexisting entries (the TPU plugin
# may live on PYTHONPATH already).
export ROOT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${ROOT_DIR}${PYTHONPATH:+:${PYTHONPATH}}"

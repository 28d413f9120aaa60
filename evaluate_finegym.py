#!/usr/bin/env python
"""FineGym evaluation entry point (reference `evaluate_finegym.py`): thin
wrapper — `evaluate.py` already dispatches to the FineGym harness when
DATASETS[0] == 'finegym'; this script exists for CLI parity."""

import sys

import evaluate

if __name__ == "__main__":
    sys.exit(evaluate.main())

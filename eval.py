#!/usr/bin/env python3
"""MAGD evaluation CLI shim — see dexgangrasp_tpu/cli.py (eval_main)."""
from dexgangrasp_tpu.cli import eval_main

if __name__ == "__main__":
    eval_main()

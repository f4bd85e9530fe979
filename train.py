#!/usr/bin/env python3
"""Training CLI shim — see dexgangrasp_tpu/cli.py (train_main)."""
from dexgangrasp_tpu.cli import train_main

if __name__ == "__main__":
    train_main()

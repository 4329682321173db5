#!/usr/bin/env python
"""Repo-root training entry point (same surface position as the reference's
cli.py, but stage-selectable): python cli.py fit -c configs/config_gan.yaml"""
from megatts2_tpu.cli import main

if __name__ == "__main__":
    main()

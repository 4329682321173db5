#!/usr/bin/env python
"""Repo-root inference entry point:
python infer.py --wavs_dir data/demo --text "..." [--g_ckpt generator.ckpt ...]"""
from megatts2_tpu.infer import main

if __name__ == "__main__":
    main()

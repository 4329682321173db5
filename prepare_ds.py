#!/usr/bin/env python
"""Repo-root dataset preparation entry point (same flags as the reference):
python prepare_ds.py --stage {0,1,2} --wavtxt_path ... --ds_path ..."""
from megatts2_tpu.prepare_ds import main

if __name__ == "__main__":
    main()

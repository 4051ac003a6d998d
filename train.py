#!/usr/bin/env python
"""Root-level entry shim: `python train.py task=... controller=... train=...`"""
from rgbmanip_tpu.train import main

if __name__ == "__main__":
    main()
